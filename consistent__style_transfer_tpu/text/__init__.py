from .bpe import BPETokenizer  # noqa: F401
from .word2vec import Word2Vec  # noqa: F401
