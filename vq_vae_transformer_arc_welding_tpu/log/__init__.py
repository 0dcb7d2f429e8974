from .csv import CSVLogger
from .wandb import WandbLogger
from .mlflow import MLFlowLogger
from .select import select_logger
