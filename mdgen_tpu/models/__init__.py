"""Model layer: the latent trajectory denoiser and its building blocks."""
from .latent_model import IPALayer, LatentMDGenLayer, LatentMDGenModel  # noqa: F401
from .attention import RoPEAttention  # noqa: F401
from .ipa import InvariantPointAttention  # noqa: F401
from .hyena import HyenaOperator  # noqa: F401
from .layers import FinalLayer, TimestepEmbedder, modulate, sincos_pos_embed  # noqa: F401
