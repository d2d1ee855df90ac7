from .checkpoint import (
    latest_epoch,
    load_bounds,
    load_checkpoint,
    prune_checkpoints,
    wait_for_checkpoints,
    save_bounds,
    save_checkpoint,
)
from .config import load_config, save_experiment_params, yield_forever
from .convert import (convert_autoencoder, convert_denoiser,
                      convert_feature_extractor, convert_scene_model,
                      load_torch_checkpoint)
from .stats_logger import AverageAggregator, StatsLogger, WandB
from .profiling import ThroughputMeter, TraceWindow, annotate, trace
