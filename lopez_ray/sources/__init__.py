from .corpus import read_corpus, read_parquet_clean, write_dataset

__all__ = ["read_corpus", "read_parquet_clean", "write_dataset"]
