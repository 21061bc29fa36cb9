from openrec_tpu.metrics.ranking import AUC, MSE, NDCG, Precision, Recall
from openrec_tpu.metrics.mean import DictMean, Mean
