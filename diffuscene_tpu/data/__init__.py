from .encoding import (
    Bounds,
    EncodingPipeline,
    build_encoding,
    descale,
    descale_sample,
    diffusion_encode,
    scale,
    scale_sample,
)
from .loader import DataLoader, EncodedDataset, collate
from .splits import CSVSplitsBuilder
from .synthetic import make_synthetic_cached_dataset
from .threed_front import CachedThreedFront
