from .ts2vec import TS2Vec, eval_classification
from .encoder import ts_encoder_apply, ts_encoder_init
from .losses import hierarchical_contrastive_loss
