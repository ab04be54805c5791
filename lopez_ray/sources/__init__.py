from .corpus import read_corpus, write_dataset

__all__ = ["read_corpus", "write_dataset"]
