"""Pallas TPU kernels — currently empty, deliberately.

Three hand-written kernels were built, benchmarked against XLA's fusion on
the real chip at the production shapes, and retired when they lost:

- Poisson-NLL (exp+mul+reduce): XLA ties at (16,100,668) and wins 3.3x at
  (256,100,668) — measurements in ``ops/poisson.py``.
- fused attention (QK^T+softmax+PV per (batch,head)): the real cost was
  head-transpose layout, not fusion; the transpose-free einsum layout is
  9x faster and XLA-fused — measurements in ``ops/attention.py``.
- fused InfoNCE (similarity matmul + logsumexp): XLA wins 10-30x at every
  production shape — measurements in ``ops/contrastive.py``.
- jax's own Pallas TPU flash attention at the VideoMAE-probe shape
  (B=8, S=1568, H=12, D=64, bf16 fwd): best block config (pad 2048,
  block 512) ties the einsum layout at 5.6 vs 5.7 ms and the required
  pad-to-128-multiple configs lose up to 2.2x — measurements in
  ``scripts/profile_attn_flash.py``. The real lever for the frozen-probe
  workload was architectural: cache the frozen backbone's features once
  per trial (``train/base.py:_encode_staged_trials``) instead of
  recomputing 12 layers of attention every epoch.
- fused readout W-stream update (round 3): tile matmul + add + stochastic
  round over the 504M kernel, so HBM sees only W in/out. Lost to XLA's
  dot-epilogue fusion on every variant: 14.35 ms (tm=1024), 5.86 ms
  (tm=4096, arbitrary semantics, io-aliased), 6.95 ms (hardware prng +
  ``pltpu.stochastic_round``) vs XLA 4.60 ms for the same math. The win
  that shipped was algebraic, not a kernel: the rank-B factored update in
  ``ops/fused_readout.py`` (never materialize the gradient), with XLA
  scheduling the resulting two small matmuls + epilogue. The kernel stays
  in ``ops/fused_readout.py`` as the A/B harness (``use_pallas=True``).

This workload's hot ops are small-sequence matmul shapes that XLA already
schedules optimally (SURVEY.md §5.7: 64-121 tokens, 100 spike bins); the
performance levers that actually moved the numbers were layout, precision
policy (bf16 matmuls / f32 accumulation+softmax), device-resident data, and
donated buffers. New kernels belong here only with a measured win attached.
"""
