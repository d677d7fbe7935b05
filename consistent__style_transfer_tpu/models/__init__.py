from .generator import DenoiseSeq2Seq  # noqa: F401
from .lm import TransformerLM  # noqa: F401
from .classifier import TextCNN  # noqa: F401
from .matcher import PairMatcher  # noqa: F401
from .discriminator import RelGANDiscriminator  # noqa: F401
