from openrec_tpu.ops.topk import fused_score_topk, topk_xla
