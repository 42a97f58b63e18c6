from matcha_tpu.sampler.bloom import DeviceBloomFilter, build_bloom  # noqa: F401
from matcha_tpu.sampler.negative import sample_negatives, assemble_batch  # noqa: F401
