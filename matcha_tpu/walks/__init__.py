from matcha_tpu.walks.alias import AliasTables, build_alias_tables  # noqa: F401
from matcha_tpu.walks.clique import clique_node2vec_walks  # noqa: F401
from matcha_tpu.walks.hyper import hypergraph_walks  # noqa: F401
from matcha_tpu.walks.skipgram import train_skipgram  # noqa: F401
