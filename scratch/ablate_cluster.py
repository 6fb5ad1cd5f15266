"""Width-clustering decode A/B (round-3 VERDICT item 6).

The production kernel pays one fused compare term per DISTINCT active code
length; encoder-side clustering (core.canonical.cluster_widths) shortens
the chain at a measured size cost (+1.3% at k=6 on the bridge photo). This
harness stages the SAME photo batch under the optimal table and a k=6
clustered table and times the two production decode pipelines interleaved
in one process (the only A/B methodology that survives this box's 10-15%
cross-process drift — PERF.md).

Run from /root/repo on the TPU: python scratch/ablate_cluster.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import bench
from metalhuffman_tpu import native
from metalhuffman_tpu.core import blocks as B, canonical, container, delta as D
from metalhuffman_tpu.models import CodecConfig, frame_stream


def main(frames_n=30, h=1536, w=2048, iters=20, reps=7, k=6):
    import jax

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    base = bench.photo_frames(h, w, frames_n)
    payload = np.concatenate(
        [D.delta_encode_blocks(B.image_to_blocks(f)).reshape(-1)
         for f in base])
    freqs = np.bincount(payload, minlength=256).astype(np.int64)
    w_opt = canonical.huffman_code_lengths(freqs)
    w_clu = canonical.cluster_widths(freqs, k)
    nd_opt = np.unique(w_opt[freqs > 0]).size
    nd_clu = np.unique(w_clu[freqs > 0]).size
    cfg = CodecConfig(backend="pallas")

    def stage(widths):
        enc = native.encode_symbols(payload, widths=widths)
        stream = container.EncodedStream(
            enc.num_symbols, enc.widths, enc.code_bytes, enc.block_offsets)
        return frame_stream.prepare_shared(stream, frames_n, h, w, cfg)

    p_opt, p_clu = stage(w_opt), stage(w_clu)
    bits_opt = 8 * p_opt.rows.size  # not meaningful; report stream sizes
    size_opt = int((freqs * w_opt.astype(np.int64)).sum())
    size_clu = int((freqs * w_clu.astype(np.int64)).sum())
    print(f"widths: {nd_opt} -> {nd_clu} distinct; size x"
          f"{size_clu/size_opt:.4f} (+{(size_clu/size_opt-1)*100:.2f}%)",
          file=sys.stderr, flush=True)

    def run(p):
        return frame_stream.decode_shared_step(p, cfg, raw=True)

    # validate bit-exact
    for p, name in ((p_opt, "opt"), (p_clu, "clu")):
        out = frame_stream.frames_from_raw(
            run(p), frames_n, h, w, w_pad=p.w_pad, bh=p.bh)
        assert np.array_equal(out, base), f"{name} mismatch"
    print("both variants bit-exact", file=sys.stderr, flush=True)
    bench._barrier(run(p_opt))
    bench._barrier(run(p_clu))

    def timed(p):
        t0 = time.perf_counter()
        r = None
        for _ in range(iters):
            r = run(p)
        bench._barrier(r)
        return base.size * iters / (time.perf_counter() - t0) / 1e9

    a, b = [], []
    for rep in range(reps):  # interleaved: drift hits both equally
        a.append(timed(p_opt))
        b.append(timed(p_clu))
    a.sort()
    b.sort()
    med_a, med_b = a[len(a) // 2], b[len(b) // 2]
    print(f"optimal table ({nd_opt} widths): {med_a:.2f} GB/s "
          f"{['%.1f' % x for x in a]}", file=sys.stderr)
    print(f"clustered k={k} ({nd_clu} widths): {med_b:.2f} GB/s "
          f"{['%.1f' % x for x in b]}", file=sys.stderr)
    print(f"speed x{med_b/med_a:.3f} at size x{size_clu/size_opt:.4f}",
          flush=True)


if __name__ == "__main__":
    main()
