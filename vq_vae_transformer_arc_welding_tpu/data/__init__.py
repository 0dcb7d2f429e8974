from .splits import DataSplitId, get_val_test_ids
from .scaler import StandardScaler
from .asimow import ASIMoWDataModule, load_asimow_csv
from .latent import LatentPredDataModule
from .datasets import (ArraySplit, make_autoregressive, sampling_weights)
