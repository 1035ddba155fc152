"""Online inference / serving (beyond the reference).

The reference's only inference surface is offline evaluation
(``/root/reference/src/test.py``). This package adds a production serving
path for trained models: static-shape bucketed batching (XLA compiles one
executable per bucket, requests are padded to the next bucket so no shape
ever recompiles), a micro-batcher that coalesces concurrent requests into
one device dispatch, and a stdlib HTTP front end.

    session = InferenceSession.from_checkpoint(model_cfg, ckpt_dir)
    rates = session.predict(x)                  # direct, single caller
    batcher = MicroBatcher(session.predict)     # concurrent callers
    fut = batcher.submit(x[0]); fut.result()
    serve_http(batcher, port=8000)              # POST /predict
"""

from video_spike_tpu.serve.session import InferenceSession
from video_spike_tpu.serve.batcher import MicroBatcher
from video_spike_tpu.serve.http import serve_http

__all__ = ["InferenceSession", "MicroBatcher", "serve_http"]
