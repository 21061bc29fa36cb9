from openrec_tpu.metrics.ranking import (
    AUC, MSE, NDCG, Precision, Recall, metrics_from_counts)
from openrec_tpu.metrics.chunked import chunked_dot_eval_metrics
from openrec_tpu.metrics.mean import (DeviceDictMean, DeviceMean, DictMean,
                                      Mean)
