"""diffuscene-tpu: TPU-native scene-diffusion framework.

JAX/XLA/Pallas re-design of DiffuScene (CVPR 2024) — see README.md for the
component map and SURVEY.md for the reference analysis.
"""

__version__ = "0.1.0"

from . import data, diffusion, eval, models, ops, parallel, train, utils  # noqa: F401
