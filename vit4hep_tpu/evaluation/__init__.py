"""Physics evaluation: high-level features, histogram suite, classifier tests,
FPD/KPD, and u-space evaluation (SURVEY.md section 2.8)."""

from vit4hep_tpu.evaluation import us_evaluation  # noqa: F401
from vit4hep_tpu.evaluation.high_level_features import HighLevelFeatures  # noqa: F401
from vit4hep_tpu.evaluation.ugr_evaluation import run_from_py  # noqa: F401
from vit4hep_tpu.evaluation.us_evaluation import eval_ui_dists, plot_ui_dists  # noqa: F401
