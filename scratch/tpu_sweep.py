"""End-to-end TPU sweep: drive every major CLI surface on the real chip.

Covers: temporal MC encode with frame CRCs -> device-fold decode (bit-
exact), --frame N --check, --region on MHVT and MHTV through the kernel,
--check --salvage on a deliberately corrupted stream, and the full verify
chain. Run from anywhere (sys.path pins the repo); one TPU process only.
"""
import sys; sys.path.insert(0, "/root/repo")
import os, subprocess, time
import numpy as np
os.makedirs("/tmp/tpudrive", exist_ok=True)
import jax
print("devices:", jax.devices(), flush=True)
from metalhuffman_tpu.utils import fixtures
from metalhuffman_tpu.models import frame_stream
import metalhuffman_tpu as mh

img = fixtures.render_frame("bridge")
img = np.tile(img, (1, 2))[:1024, :2048]
frames = np.stack([np.roll(img, (4*t, 6*t), axis=(0,1)) for t in range(8)])
np.save("/tmp/tpudrive/clip.npy", frames)
run = lambda *a: subprocess.run([sys.executable, "-m", "metalhuffman_tpu", *a],
                                capture_output=True, text=True, cwd="/root/repo")

# 1) temporal MC + frame CRCs, encoded host, decoded through the DEVICE fold
r = run("encode-video", "/tmp/tpudrive/clip.npy", "/tmp/tpudrive/c.mhvt",
        "--temporal", "--motion", "--keyint", "4", "--frame-crcs",
        "--backend", "native")
assert r.returncode == 0, r.stderr
print("encode:", r.stdout.strip(), flush=True)
t0 = time.perf_counter()
r = run("decode-video", "/tmp/tpudrive/c.mhvt", "/tmp/tpudrive/out.npy")
assert r.returncode == 0, r.stderr
print(f"decode-video (pallas, device fold): {r.stdout.strip()}", flush=True)
assert np.array_equal(np.load("/tmp/tpudrive/out.npy"), frames), "MISMATCH"
print("bit-exact", flush=True)

# 2) random access with per-frame CRC check on TPU
r = run("decode-video", "/tmp/tpudrive/c.mhvt", "/tmp/tpudrive/f5.npy",
        "--frame", "5", "--check")
assert r.returncode == 0, r.stderr
print("frame 5 --check:", r.stdout.strip(), flush=True)
assert np.array_equal(np.load("/tmp/tpudrive/f5.npy"), frames[5])

# 3) spatio-temporal ROI on TPU (MHVT plain-temporal variant uses region blocks)
r = run("encode-video", "/tmp/tpudrive/clip.npy", "/tmp/tpudrive/p.mhvt",
        "--temporal", "--keyint", "4", "--backend", "native")
assert r.returncode == 0, r.stderr
r = run("decode-video", "/tmp/tpudrive/p.mhvt", "/tmp/tpudrive/roi.npy",
        "--frame", "6", "--region", "256", "512", "128", "256")
assert r.returncode == 0, r.stderr
print("MHVT region:", r.stdout.strip(), flush=True)
assert np.array_equal(np.load("/tmp/tpudrive/roi.npy"),
                      frames[6, 256:384, 512:768]), "ROI MISMATCH"

# 4) plain MHTV region on the pallas kernel
r = run("encode-video", "/tmp/tpudrive/clip.npy", "/tmp/tpudrive/p.mhtv",
        "--backend", "native")
assert r.returncode == 0, r.stderr
r = run("decode-video", "/tmp/tpudrive/p.mhtv", "/tmp/tpudrive/roi2.npy",
        "--region", "128", "128", "64", "96")
assert r.returncode == 0, r.stderr
assert np.array_equal(np.load("/tmp/tpudrive/roi2.npy"),
                      frames[:, 128:192, 128:224]), "MHTV ROI MISMATCH"
print("MHTV region:", r.stdout.strip(), flush=True)

# 5) salvage on a corrupted stream, on-device end-bit check
import struct
blob = bytearray(open("/tmp/tpudrive/p.mhtv", "rb").read())
stream, t, h, w, bd, delta = frame_stream.read_shared(bytes(blob))
(core_len,) = struct.unpack_from("<I", bytes(blob), 22)
code_off = 26 + 8 + 256 + int(stream.block_offsets[777]) // 8 + 2
blob[code_off : code_off + 8] = b"\xff" * 8
open("/tmp/tpudrive/bad.mhtv", "wb").write(bytes(blob))
r = run("decode-video", "/tmp/tpudrive/bad.mhtv", "/tmp/tpudrive/sal.npy",
        "--check", "--salvage")
assert r.returncode == 0, (r.stdout, r.stderr)
print("salvage:", [ln for ln in r.stderr.splitlines() if "salvaged" in ln],
      flush=True)
sal = np.load("/tmp/tpudrive/sal.npy")
nz = (sal != frames)
print(f"salvaged output differs in {int(nz.any(axis=(1,2)).sum())} frame(s), "
      f"{int(nz.sum())} px", flush=True)
assert nz.sum() > 0 and nz.sum() < 64 * 64 * 8, "salvage damage bounded"

# 6) verify on the frame-CRC'd MHVT (full integrity chain on TPU)
r = run("verify", "/tmp/tpudrive/c.mhvt")
assert r.returncode == 0, (r.stdout, r.stderr)
print(r.stdout.strip(), flush=True)
print("ROUND-3 TPU SWEEP OK", flush=True)

# 7) round-4 streaming surfaces on the chip: streamed MHV2 encode ->
#    streamed decode (pallas segment pipeline + streamed CRC chain),
#    streamed --check (on-device end-bit per segment), MHTC color
#    streamed both ways, MHVT group-chunked streaming decode
r = run("encode-video", "/tmp/tpudrive/clip.npy", "/tmp/tpudrive/s.mhv2",
        "--streaming", "--segment-frames", "3", "--frame-crcs")
assert r.returncode == 0, r.stderr
print("streamed encode:", r.stdout.strip(), flush=True)
r = run("decode-video", "/tmp/tpudrive/s.mhv2", "/tmp/tpudrive/sdec.npy",
        "--streaming")
assert r.returncode == 0, (r.stdout, r.stderr)
print("streamed decode (pallas):", r.stdout.strip(), flush=True)
assert np.array_equal(np.load("/tmp/tpudrive/sdec.npy"), frames), "MISMATCH"
r = run("decode-video", "/tmp/tpudrive/s.mhv2", "/tmp/tpudrive/sdec2.npy",
        "--streaming", "--check")
assert r.returncode == 0, (r.stdout, r.stderr)
print("streamed decode --check (on-device end-bit):", r.stdout.strip(),
      flush=True)
assert np.array_equal(np.load("/tmp/tpudrive/sdec2.npy"), frames)

cframes = np.stack([np.roll(np.stack([img[:512, :512],
                                      np.roll(img[:512, :512], 31, 1),
                                      np.roll(img[:512, :512], 67, 0)], -1),
                            9 * t, 0) for t in range(4)])
np.save("/tmp/tpudrive/cclip.npy", cframes)
r = run("encode-video", "/tmp/tpudrive/cclip.npy", "/tmp/tpudrive/s.mhtc",
        "--streaming", "--color", "--subgreen", "--segment-frames", "2")
assert r.returncode == 0, r.stderr
print("streamed color encode:", r.stdout.strip(), flush=True)
r = run("decode-video", "/tmp/tpudrive/s.mhtc", "/tmp/tpudrive/cdec.npy",
        "--streaming")
assert r.returncode == 0, (r.stdout, r.stderr)
print("streamed color decode (pallas):", r.stdout.strip(), flush=True)
assert np.array_equal(np.load("/tmp/tpudrive/cdec.npy"), cframes), "MISMATCH"

r = run("decode-video", "/tmp/tpudrive/c.mhvt", "/tmp/tpudrive/tdec.npy",
        "--streaming")
assert r.returncode == 0, (r.stdout, r.stderr)
print("streamed MHVT decode (device fold per group chunk):",
      r.stdout.strip(), flush=True)
assert np.array_equal(np.load("/tmp/tpudrive/tdec.npy"), frames), "MISMATCH"
print("ROUND-4 TPU SWEEP OK", flush=True)
