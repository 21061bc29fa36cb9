from openrec_tpu.models.base import Recommender
from openrec_tpu.models.bpr import BPR
from openrec_tpu.models.pmf import PMF
from openrec_tpu.models.wrmf import WRMF
from openrec_tpu.models.gmf import GMF
from openrec_tpu.models.ucml import CML, UCML
from openrec_tpu.models.dlrm import DLRM, criteo_dlrm
from openrec_tpu.models.nbpr import NBPR, WCML
from openrec_tpu.models.visual import (
    VBPR, ConcatVisualBPR, VisualBPR, VisualCML, VisualGMF, VisualPMF)
from openrec_tpu.models.user_feature import UserPMF, UserVisualPMF
from openrec_tpu.models.cdl import CDL
from openrec_tpu.models.itr_mlp import ItrMLP
from openrec_tpu.models.sequence import RNNRec, VanillaYouTubeRec, YouTubeRec
from openrec_tpu.models.ncf import MLPRec, NeuMF
