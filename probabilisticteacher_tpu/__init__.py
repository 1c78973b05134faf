"""probabilisticteacher_tpu: TPU-native Probabilistic Teacher framework.

A from-scratch JAX/XLA re-design of hikvision-research/ProbabilisticTeacher
(ICML 2022) for domain-adaptive object detection on TPU. See SURVEY.md for the
reference analysis and DESIGN.md for the architecture decisions.
"""

from . import ops  # noqa: F401
from .config import CfgNode, add_config, get_cfg  # noqa: F401

__version__ = "0.1.0"
