from .corpus import synth_corpus, expected_edges, corpus_num_files  # noqa: F401
