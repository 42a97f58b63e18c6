from matcha_tpu.ops.incidence import (PaddedIncidence,  # noqa: F401
                                      edge_gather_sum, edge_sddmm,
                                      node_scatter_add)
