"""jaxlsq.serve — frozen INT8/INT4 inference path.

The serving half of the framework (SURVEY.md §7 step 6; the reference stops at
handing qparams to ``torch.quantization.convert``, observers.py:403-422):

* ``pack``    — quantize + nibble-pack trained weights (PackedWeight pytree).
* ``matmul``  — weight-only matmul with dequant fused into the epilogue
  (Pallas TPU kernel) + dynamic int8×int8 path.
* ``convert`` — QAT variables → serving variables; TP sharding helpers.
* ``decode``  — KV cache + prefill + scan-fused greedy generation.
* ``attention`` — fused Pallas flash-decoding over (quantized) KV caches.
"""

from .attention import decode_attention
from .convert import convert, shard_converted, shard_packed, serving_bits
from .paged import (PageAllocator, PagedKVLayer, init_paged_cache,
                    paged_attention, paged_update, with_table)
from .paged_engine import (PagedDecodeEngine, PagedPrefix,
                           PagedSpeculativeDecodeEngine)
from .decode import (DecodeEngine, Prefix, SpeculativeDecodeEngine,
                     init_kv_cache,
                     make_beam_search,
                     make_generate, make_sampler, make_speculative_generate,
                     prefill)
from .engine import ServingEngine
from .export import (export_generate, export_serving_forward, load_exported,
                     load_exported_file, save_exported_file)
from .matmul import (dynamic_int8_matmul, static_int8_conv,
                     static_int8_matmul, wo_matmul)
from .pack import (PackedWeight, dequantize_weight, pack_int4, quantize_weight,
                   quantize_weight_grouped,
                   unpack_int4)

__all__ = [
    "convert", "decode_attention", "shard_converted", "shard_packed",
    "serving_bits",
    "PageAllocator", "PagedKVLayer", "init_paged_cache", "paged_attention",
    "paged_update", "with_table",
    "PagedDecodeEngine", "PagedPrefix", "PagedSpeculativeDecodeEngine",
    "ServingEngine",
    "DecodeEngine", "Prefix", "init_kv_cache", "make_beam_search", "make_generate", "make_sampler",
    "make_speculative_generate", "SpeculativeDecodeEngine", "prefill",
    "dynamic_int8_matmul", "static_int8_conv", "static_int8_matmul",
    "wo_matmul",
    "PackedWeight", "dequantize_weight", "pack_int4", "quantize_weight",
    "quantize_weight_grouped",
    "unpack_int4",
    "export_serving_forward", "export_generate", "load_exported",
    "save_exported_file", "load_exported_file",
]
