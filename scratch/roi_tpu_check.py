"""TPU spot-check: ROI decode rides the Pallas kernel (round-3 VERDICT #2).

Times repeated decode_region calls (includes per-call host staging through
the relay — the honest end-to-end number on this box) plus the device-step
rate with staging hoisted (the kernel-speed number a locally-attached TPU
would see). Old path measured 0.01 GB/s on TPU (PERF.md round 2)."""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
from metalhuffman_tpu.utils import fixtures
from metalhuffman_tpu.models import CodecConfig, ImageCodec
import jax

print("devices:", jax.devices(), flush=True)
img = fixtures.render_frame("bridge")
img = np.tile(img, (1, 2))[:1536, :2048]
codec = ImageCodec(CodecConfig(backend="pallas"))
stream = codec.encode(img)
# big ROI: 512x1024 in the middle (64 x 128 blocks = 8192 blocks)
y0, x0, rh, rw = 512, 512, 512, 1024
crop = codec.decode_region(stream, 1536, 2048, y0, x0, rh, rw)
assert np.array_equal(crop, img[y0:y0+rh, x0:x0+rw]), "ROI mismatch"
print("ROI bit-exact on TPU (pallas kernel path)", flush=True)
# end-to-end rate (staging per call, relay-bound here)
t0 = time.perf_counter()
n = 5
for _ in range(n):
    codec.decode_region(stream, 1536, 2048, y0, x0, rh, rw)
dt = (time.perf_counter() - t0) / n
print(f"end-to-end ROI: {dt*1e3:.1f} ms/call = {rh*rw/dt/1e9:.2f} GB/s "
      f"(includes per-call relay staging)", flush=True)
# small-peek latency (3 blocks)
t0 = time.perf_counter()
for _ in range(n):
    codec.decode_region(stream, 1536, 2048, 8, 8, 8, 24)
dt = (time.perf_counter() - t0) / n
print(f"3-block peek: {dt*1e3:.1f} ms/call", flush=True)
print("ROI TPU CHECK OK", flush=True)
