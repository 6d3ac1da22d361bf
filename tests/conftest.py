"""Test configuration: force JAX onto CPU with 8 virtual devices.

Multi-device sharding tests (SyncBN pmean, gradient all-reduce equivalence)
run on a virtual CPU mesh exactly as the driver's dryrun does.

The ambient environment routes every python process through the axon TPU
plugin (sitecustomize on PYTHONPATH) with REMOTE compilation — each XLA
compile round-trips the TPU relay socket, turning a 30 s CPU suite into
30+ minutes (or a deadlock when the relay is busy).  When that environment
is detected the conftest re-execs pytest once with a clean environment.
"""
import os
import sys

if ".axon_site" in os.environ.get("PYTHONPATH", "") and not os.environ.get(
    "PLANEDEPTH_TEST_REEXEC"
):
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["PLANEDEPTH_TEST_REEXEC"] = "1"
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest"] + sys.argv[1:],
        env,
    )

# hard override: the ambient environment pins JAX_PLATFORMS to the TPU
# tunnel, which must never be touched from the test suite.
os.environ["JAX_PLATFORMS"] = "cpu"
# single shared CPU core: avoid torch/XLA thread-pool oversubscription
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent compilation cache: XLA CPU compiles of the train-step graphs
# dominate suite time on small machines; cache them across runs.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
