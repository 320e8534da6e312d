"""Standalone serving consumer (run via subprocess by test_serving.py).

Simulates a serving binary: it imports ONLY ``shapegen_tpu.serving`` (which
pulls in no model/task/training code — the package root imports just the
pure-jnp core), deserializes an exported StableHLO sampler blob from disk,
runs it, and writes the output. If this process can produce samples, the
artifact truly carries everything (weights + the compiled 1000-step scan)
and a consumer needs no Python model code.
"""

import sys

import numpy as np


def main():
    blob_path, seed, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    # Guard the claim itself: no model/training modules may be imported.
    from shapegen_tpu import serving

    banned = [
        m for m in sys.modules
        if m.startswith("shapegen_tpu.models")
        or m.startswith("shapegen_tpu.train")
        or m.startswith("flax")
    ]
    assert not banned, f"consumer imported model code: {banned}"

    fn = serving.load_sampler(open(blob_path, "rb").read())
    out = fn(serving.key_data(seed))
    np.save(out_path, np.asarray(out))
    print(f"consumer OK: {np.asarray(out).shape}", flush=True)


if __name__ == "__main__":
    main()
