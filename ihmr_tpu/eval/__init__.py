from ihmr_tpu.eval.evaluator import Evaluator  # noqa: F401
from ihmr_tpu.eval.result_stat import ResultStat  # noqa: F401
from ihmr_tpu.eval import metrics  # noqa: F401
