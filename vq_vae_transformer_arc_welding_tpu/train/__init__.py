from .metrics import classification_metrics, binary_f1, accuracy_micro
from .optim import make_radam, make_transformer_optimizer
from .checkpoint import save_checkpoint, load_checkpoint
