"""Evaluation engines: accuracy, OOD detection, misclassification detection,
ODIN — the measurement workhorses built on the evaluate() core + device ROC."""

from .engines import (accuracy, ood_detection_rates,  # noqa: F401
                      misclassification_detection_rates)
from .odin import make_odin_scores  # noqa: F401
