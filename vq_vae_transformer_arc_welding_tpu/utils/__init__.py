from .random import dropout
from .names import generate_funny_name
