from .corpus import StyleCorpus, load_s2l  # noqa: F401
from .noise import align, rand_perm, transfer_noise  # noqa: F401
from .pipeline import BatchIterator, make_batches  # noqa: F401
