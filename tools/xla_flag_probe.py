#!/usr/bin/env python3
"""Does the axon remote compiler honor post-init XLA_FLAGS?

The local jaxlib aborts at init on unknown flags (xla_tpu_* don't exist
in its DebugOptions — BENCH_NOTES r5 close-out), but the axon client
reads XLA_FLAGS per-request when hashing the compile-cache prefix
(axon/register/pjrt.py:213-215), suggesting the env may be forwarded to
the remote compiler.  This probe decides it empirically:

  1. init jax with a clean env; compile trivial program A (baseline ok);
  2. set XLA_FLAGS to a DELIBERATELY MALFORMED tpu flag post-init;
     compile trivial program B:
       - remote parses the env  -> compile ERROR (flag rejected there)
       - env not forwarded      -> B compiles fine (flag silently unused)
  3. set a well-formed xla_tpu flag; compile program C (sanity).

Prints one JSON verdict line.  Run on the real chip, nothing else using
the TPU.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.pop("XLA_FLAGS", None)
    import jax
    import jax.numpy as jnp

    jax.devices()  # init under the clean env

    def compile_unique(tag, k):
        t0 = time.time()
        out = jax.jit(lambda a: a * k + jnp.tanh(a) * (k + 1.0))(
            jnp.ones((128, 128))
        )
        out.block_until_ready()
        return time.time() - t0

    r = {"platform": jax.devices()[0].platform}
    r["baseline_s"] = round(compile_unique("base", 1.25), 2)

    os.environ["XLA_FLAGS"] = "--xla_tpu_scoped_vmem_limit_kib=notanumber"
    try:
        r["malformed_s"] = round(compile_unique("bad", 2.25), 2)
        r["malformed"] = "compiled-ok (env NOT parsed remotely, or flag ignored)"
    except Exception as e:
        r["malformed"] = f"ERROR ({type(e).__name__}): {str(e)[:200]} " \
                         "-> remote PARSES post-init XLA_FLAGS"

    os.environ["XLA_FLAGS"] = "--xla_tpu_scoped_vmem_limit_kib=65536"
    try:
        r["vmem64m_s"] = round(compile_unique("vmem", 3.25), 2)
        r["vmem64m"] = "compiled-ok"
    except Exception as e:
        r["vmem64m"] = f"ERROR: {str(e)[:200]}"

    print(json.dumps(r))


if __name__ == "__main__":
    main()
