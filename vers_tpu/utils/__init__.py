from vers_tpu.utils.data import (
    load_vec_file,
    load_wiki_vector,
    write_vec_file,
    synthetic_words_dataset,
    synthetic_gaussian,
)
from vers_tpu.utils.harness import search_exhaustive, recall_at_k, run_test

__all__ = [
    "load_vec_file",
    "load_wiki_vector",
    "write_vec_file",
    "synthetic_words_dataset",
    "synthetic_gaussian",
    "search_exhaustive",
    "recall_at_k",
    "run_test",
]
