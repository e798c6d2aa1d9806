# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Per-round fixed overhead of a data-dependent while_loop on this TPU.

Calibrates the roofline's ``loop_rounds`` rate (scripts/roofline.py):
runs a while_loop whose body does one elementwise pass over a
bench-shaped [8192, 128] buffer (small enough that lane work is
negligible next to the loop machinery), with a traced trip bound so one
compile serves both counts; per-round cost = (t(N2) - t(N1)) / (N2-N1)
via the one-dispatch/one-readback loop methodology (design.md rule 6).

Prints one JSON line: {"round_us": ...}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sentencepiece_tpu.utils import compile_cache

    compile_cache.enable()
    x0 = jnp.asarray(np.random.RandomState(0)
                     .rand(8192, 128).astype(np.float32))

    @jax.jit
    def run(x, n):
        def cond(s):
            return s[1] < n

        def body(s):
            y, i = s
            return y + jnp.float32(1.0) / (i + 1), i + 1

        return jax.lax.while_loop(cond, body, (x, jnp.int32(0)))[0]

    def force(n):
        out = run(x0, jnp.int32(n))
        t0 = time.time()
        float(np.asarray(out[0, 0]))
        return time.time() - t0

    force(8)
    force(808)
    a = min(force(8) for _ in range(3))
    b = min(force(808) for _ in range(3))
    us = (b - a) / 800 * 1e6
    print(json.dumps({"round_us": round(us, 2),
                      "t_n8_s": round(a, 3), "t_n808_s": round(b, 3)}))


if __name__ == "__main__":
    main()
