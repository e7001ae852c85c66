"""KV-cache quantization runtime: GEAR/KIVI codecs, compression config,
static-shape quantized decode caches, sink/window policies."""

from .cache import (  # noqa: F401
    DenseDecodeCache,
    DenseKVState,
    QuantizedDecodeCache,
    QuantKVConfig,
    QuantKVState,
    init_dense_cache,
    init_quant_cache,
)
from .config import CompressionConfig  # noqa: F401
from .gear import (  # noqa: F401
    compress_insert,
    fake_channel_group_quant,
    fake_dense_sparse_quant,
    fake_token_group_quant,
    fake_uniform_quant,
    gearl_channel_quant,
    gearl_token_quant,
    gears_channel_quant,
    gears_token_quant,
    gearsl_channel_quant,
    gearsl_token_quant,
    power_iteration_lowrank,
    true_gear_compress,
    true_gear_decompress,
    true_outlier_compress,
    true_outlier_decompress,
    true_poweriteration,
    true_uniform_compress,
    true_uniform_decompress,
    true_uniform_compress_batchwise,
    true_uniform_decompress_batchwise,
    pack_4bit_halves,
    unpack_4bit_halves,
)
from .h2o import (H2OCache, H2OKVState, QuantH2OCache,  # noqa: F401
                  QuantH2OKVState, init_h2o_cache,
                  init_quant_h2o_cache)
from .sink import SinkDecodeCache, SinkKVState, init_sink_cache  # noqa: F401
