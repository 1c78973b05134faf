"""probabilisticteacher_tpu: TPU-native Probabilistic Teacher (DAOD) framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
hikvision-research/ProbabilisticTeacher (ICML 2022). See SURVEY.md for the reference
analysis and DESIGN.md for the TPU-native architecture.
"""

__version__ = "0.1.0"

from .config import CfgNode, get_cfg, add_config  # noqa: F401
