from .activations import new_gelu, gelu, leaky_relu
from .patching import patchify, patch_embed, patch_embed_inverse
from .conv import conv1d_same, center_tap_dense, conv_transpose_block
from .norm import BatchNormState, batch_norm_apply, layer_norm
from .vq import vq_quantize, vq_lookup, VQOutput
from .gru import gru_forward
from .attention import causal_self_attention
