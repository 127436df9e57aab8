"""TPU-tunnel health preflight: stage-by-stage with hard timeouts.

The axon relay can wedge in a way that is invisible to coarse probes:
device enumeration and H2D/dispatch/block_until_ready all succeed while
every device->host FETCH (even of a scalar) hangs forever — observed
2026-08-19 after the previous session died mid-checkpoint-save on a
tunnel-RPC hang. A plain `jnp.ones((8,8)) @ ...` probe just looks like
"TPU hangs"; this script isolates which leg is broken.

Each stage runs in a worker thread with a timeout so the script always
terminates with a verdict. Exit 0 = all stages pass; exit 1 = a stage
timed out or failed (named on stderr). Run before committing to a long
TPU job:

    timeout 600 python scripts/tpu_health.py
"""
import sys
import threading
import time


def stage(name, fn, timeout):
    result = {}

    def run():
        try:
            t0 = time.time()
            result["value"] = fn()
            result["dt"] = time.time() - t0
        except Exception as e:  # noqa: BLE001 — report, don't crash
            result["error"] = repr(e)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout)
    if t.is_alive():
        print(f"FAIL {name}: no response in {timeout:.0f}s (hung)",
              file=sys.stderr, flush=True)
        return False
    if "error" in result:
        print(f"FAIL {name}: {result['error']}", file=sys.stderr,
              flush=True)
        return False
    print(f"ok   {name}: {result['dt']:.3f}s -> {result['value']}",
          flush=True)
    return True


def main():
    import numpy as np

    state = {}

    def devices():
        import jax

        state["jax"] = jax
        ds = jax.devices()
        return f"{len(ds)}x {ds[0].device_kind} ({ds[0].platform})"

    def put():
        jax = state["jax"]
        state["a"] = jax.device_put(np.eye(8, dtype=np.float32),
                                    jax.devices()[0])
        return "eye(8) on device"

    def execute():
        jax = state["jax"]
        f = jax.jit(lambda x: (x @ x).sum())
        state["r"] = f(state["a"])
        state["r"].block_until_ready()
        return "jit matmul executed"

    def fetch():
        # the leg that wedges: a scalar D2H transfer
        return float(np.asarray(state["r"]))

    def bulk_fetch():
        # a degradation mode the scalar probe can miss: small transfers
        # work but multi-MB fetches stall (the ~25 MB/s state fetches in
        # CLAUDE.md ride this leg; 32 MB ≈ 1.3s healthy).
        jax = state["jax"]
        import jax.numpy as jnp

        big = jax.jit(
            lambda x: jnp.tile(x, (128, 1024)))(state["a"])  # 32 MB f32
        big.block_until_ready()
        arr = np.asarray(big)
        return f"{arr.nbytes / 1e6:.0f} MB fetched, sum={arr.sum():.0f}"

    ok = (stage("devices (plugin init + enumeration)", devices, 60)
          and stage("device_put (H2D)", put, 60)
          and stage("jit execute + block_until_ready", execute, 300)
          and stage("fetch (D2H)  <- the leg that wedges", fetch, 120)
          and stage("bulk fetch (32 MB D2H)", bulk_fetch, 120))
    print("TUNNEL HEALTHY" if ok else "TUNNEL BROKEN", flush=True)
    sys.stdout.flush()
    sys.stderr.flush()
    # _exit: a worker thread may be permanently blocked inside the PJRT
    # C++ client; normal interpreter teardown aborts on it.
    import os

    os._exit(0 if ok else 1)


if __name__ == "__main__":
    main()
