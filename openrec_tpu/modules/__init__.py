from openrec_tpu.modules.embedding import (
    censor_max_norm, censor_norm, embedding_init, embedding_lookup)
from openrec_tpu.modules.mlp import MLP, activate, glorot_uniform
from openrec_tpu.modules.interactions import (
    masked_mean_pool, second_order_interaction)
from openrec_tpu.modules.fusions import average_fusion, concat_fusion
from openrec_tpu.modules.sdae import SDAE
from openrec_tpu.modules.rnn import GRU, LSTM
from openrec_tpu.modules import losses
