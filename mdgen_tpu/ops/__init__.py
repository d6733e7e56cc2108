"""TPU kernels and kernel-adjacent ops (Pallas + blockwise-JAX fallbacks)."""
from .flash_attention import flash_attention, chunked_attention  # noqa: F401
from .fused_block import fused_l_sublayer  # noqa: F401
from .fused_ffn import fused_ffn_sublayer  # noqa: F401
from .fused_t_block import fused_t_sublayer  # noqa: F401
