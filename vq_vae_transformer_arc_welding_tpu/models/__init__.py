from .vqvae_patch import VQVAEPatch
from .mlp import MLP
from .gru import GRU
from .transformer import TransformerDecoder
from .mlp_embedding import MLPEmbedding
