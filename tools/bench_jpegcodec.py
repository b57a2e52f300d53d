"""JPEG decode-throughput microbench (BENCH/BASELINE.md rows): a
quality-85 4:2:0-default RGB stream from the module's own encoder,
decoded by the from-scratch T.81 path.

Usage: python tools/bench_jpegcodec.py [side_px]
"""

import sys, time
import numpy as np
sys.path.insert(0, ".")
from linear_kdtree_spark.functions.jpegcodec import encode_jpeg, decode_jpeg

rng = np.random.default_rng(5)
side = int(sys.argv[1]) if len(sys.argv) > 1 else 512
yy, xx = np.mgrid[0:side, 0:side]
img = np.stack([(xx//2 + rng.integers(0,16,(side,side)))%256,
                (yy//2 + rng.integers(0,16,(side,side)))%256,
                ((xx+yy)//3 + rng.integers(0,16,(side,side)))%256], axis=2).astype(np.uint8)
buf = encode_jpeg(img, quality=85)
print("jpeg bytes:", len(buf))
best = None
for _ in range(3):
    t0=time.time(); out = decode_jpeg(buf); dt=time.time()-t0
    best = dt if best is None else min(best, dt)
raw = side*side*3
print(f"decode best {best:.3f}s ({raw/best/1e6:.2f} MB/s raw)")
