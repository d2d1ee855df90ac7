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
from .factory import (get_dataset_raw_and_encoded, get_encoded_dataset,
                      get_raw_dataset, text_emb_dim_for_network)
from .filters import filter_compose, filter_function, load_furniture_map
from .raw import (
    Room,
    ThreedFront,
    ThreedFutureModel,
    parse_threed_front_scenes,
    parse_threed_future_models,
)
from .splits import CSVSplitsBuilder
from .utils_io import export_pointcloud, load_pointcloud
from .synthetic import make_synthetic_cached_dataset
from .text import TextDescriptionGenerator, compute_rel, extract_relations
from .threed_front import CachedThreedFront
from .threed_future import ThreedFutureDataset, ThreedFutureNormPCDataset
