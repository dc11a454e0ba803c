"""Multi-host bring-up path (parallel/mesh.initialize_distributed).

Real multi-host hardware is unavailable; what CAN be tested is that the
bring-up code actually forms a process group: a single-process
jax.distributed group with an explicit coordinator. Runs in a subprocess
because jax.distributed state is process-global."""

import os
import subprocess
import sys

_CODE = """
import jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, {repo!r})
from kuiperllama_tpu.parallel.mesh import initialize_distributed
initialize_distributed("localhost:{port}", num_processes=1, process_id=0)
assert jax.process_count() == 1, jax.process_count()
assert jax.process_index() == 0
import jax.numpy as jnp
print("SUM", int(jnp.sum(jnp.arange(10))))
"""


def test_initialize_distributed_single_process_group():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = _CODE.format(repo=repo, port=12397)
    env = dict(os.environ, JAX_PLATFORMS="")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=120, env=env)
    assert out.returncode == 0, (out.stdout, out.stderr)
    assert "SUM 45" in out.stdout
