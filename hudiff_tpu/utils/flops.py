"""FLOP add-back for Pallas custom calls in MFU accounting.

XLA's ``compiled.cost_analysis()['flops']`` reports ~0 for Mosaic custom
calls (measured: a fused ByteNet block reports 2.5 MFLOP where the analytic
matmul count is 5.26 GFLOP), so every flops-derived rate (TFLOP/s, MFU) in
bench.py / tools/train_breakdown.py must add back the matmul FLOPs executed
inside the fused kernels. The per-kernel counters live next to their
kernels (ops/pallas_attention.py::attention_matmul_flops,
ops/pallas_bytenet.py::block_matmul_flops); this module aggregates them for
a whole denoiser trace using the same routing rule the models apply
(models/denoiser.py::conv_pallas_policy with use_pallas='auto').
"""
from __future__ import annotations

from .. import constants as C
from ..ops.pallas_attention import attention_matmul_flops
from ..ops.pallas_bytenet import block_matmul_flops


def pallas_active() -> bool:
    """True when the fused kernels actually run (use_pallas='auto' routing:
    real TPU backend only — CPU interpret mode is test-only)."""
    import jax
    return jax.default_backend() == 'tpu'


def denoiser_pallas_flops(cfg, B: int, *, kind: str, deterministic: bool,
                          backward: bool) -> float:
    """Matmul FLOPs executed inside Pallas kernels for ONE evaluation of
    AntiTFNet (kind='pair') or NanoAntiTFNet (kind='heavy') with
    use_pallas='auto' on TPU.

    ``deterministic`` selects the trace the models build (it gates
    conv_pallas_policy: the d=768 pair dual towers fall back to XLA on
    non-deterministic traces); ``backward`` counts a fwd+bwd pass instead
    of forward-only. The two are independent so tools/train_breakdown.py
    can account its eval-mode-forward / train-mode-forward / train-mode
    fwd+bwd stages separately; train steps use (False, True).
    """
    from ..models.denoiser import conv_pallas_policy
    from ..ops.pallas_bytenet import mosaic_supported
    head_dim = cfg.att_model // cfg.nhead
    att = 2 * cfg.cs_layers * attention_matmul_flops(
        B, cfg.max_len, cfg.nhead, head_dim, backward=backward)

    k = cfg.aa_kernel_size
    if kind == 'pair':
        seg_lens = (C.HEAVY_LEN, C.LIGHT_LEN)
    elif kind == 'heavy':
        seg_lens = (C.HEAVY_LEN,)
    else:
        raise ValueError(f'unknown kind: {kind!r}')

    conv = 0.0
    for d, n_layers in ((cfg.d_model, cfg.n_encoder_layers),
                        (cfg.sum_d_model, cfg.dual_layers)):
        if (conv_pallas_policy('auto', d, deterministic) == 'never'
                or not mosaic_supported(d, d // 2)):
            continue
        for L in seg_lens:
            conv += n_layers * block_matmul_flops(
                B, L, d, d // 2, k, backward=backward)
    return att + conv
