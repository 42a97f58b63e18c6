from matcha_tpu.data.clusters import parse_clusters  # noqa: F401
from matcha_tpu.data.mcool import parse_mcool_contacts, contacts_from_arrays  # noqa: F401
from matcha_tpu.data.kmers import generate_kmers, count_kmers  # noqa: F401
from matcha_tpu.data.store import HyperedgeStore, quantile_transform  # noqa: F401
from matcha_tpu.data.batcher import BucketedBatcher  # noqa: F401
