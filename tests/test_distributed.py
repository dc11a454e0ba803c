"""Multi-host validation (parallel/mesh.initialize_distributed).

Real multi-host hardware is unavailable; what CAN be tested on one machine:
(1) the bring-up code forms a process group, and (2) a REAL 2-process
jax.distributed group — each process owning 4 virtual CPU devices — runs
one tensor+data-sharded decode step whose collectives cross the process
boundary (the DCN analogue), with every process's local output shards
matching a single-process reference. Runs in subprocesses because
jax.distributed state is process-global."""

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


_WORKER = """
import os, sys
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
sys.path.insert(0, {repo!r})
from kuiperllama_tpu.parallel.mesh import initialize_distributed
initialize_distributed(f"localhost:{{port}}", num_processes=nproc,
                       process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 4 * nproc
assert len(jax.local_devices()) == 4

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from kuiperllama_tpu.config import tiny_config
from kuiperllama_tpu.models import decoder
from kuiperllama_tpu.params import random_params
from kuiperllama_tpu.parallel.mesh import make_mesh, DATA_AXIS
from kuiperllama_tpu.parallel.sharded import ShardedForward
from kuiperllama_tpu.parallel.shardings import (cache_pspec,
                                                param_pspec_tree)

cfg = tiny_config("llama2", n_heads=8, n_kv_heads=4, dim=128,
                  hidden_dim=256, vocab_size=512, seq_len=64)
params_np = random_params(cfg, seed=3)  # identical on both processes
# dp=2 lands the data axis ACROSS the process boundary (devices 0-3 are
# process 0, 4-7 process 1), tp=4 within each process: the logits
# all-gather stays intra-process, the two per-layer psums cross it only
# via the (replicated-weight) model axis — the multi-host layout of §2.9.
mesh = make_mesh(dp=2, tp=4)
fwd = ShardedForward(cfg, mesh, params_np)

def gput(x, spec):
    x = np.asarray(x)
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

specs = param_pspec_tree(params_np)
sp = jax.tree.map(gput, params_np, specs)
B, S = 4, 16
rng = np.random.default_rng(0)
tok_np = rng.integers(0, cfg.vocab_size, (B,)).astype(np.int32)
pos_np = np.full((B,), 3, np.int32)
kshape = (cfg.n_layers, B, S, cfg.n_kv_heads, cfg.head_dim)
cache = dict(k=gput(np.zeros(kshape, np.float32), cache_pspec()),
             v=gput(np.zeros(kshape, np.float32), cache_pspec()))
tok = gput(tok_np, P(DATA_AXIS))
pos = gput(pos_np, P(DATA_AXIS))
logits, _ = decoder.decode_step(cfg, sp, tok, pos, cache, forward_fn=fwd)
jax.block_until_ready(logits)

# single-process reference on local devices, full batch, same weights
ref_params = jax.tree.map(jnp.asarray, params_np)
ref_cache = decoder.init_kv_cache(cfg, batch=B, max_len=S,
                                  dtype=jnp.float32)
ref_logits, _ = decoder.decode_step(cfg, ref_params, jnp.asarray(tok_np),
                                    jnp.asarray(pos_np), ref_cache)
ref = np.asarray(ref_logits)
for shard in logits.addressable_shards:
    got = np.asarray(shard.data)
    want = ref[shard.index]
    err = np.abs(got - want).max()
    assert err < 1e-4, (pid, shard.index, err)
print(f"OK pid={{pid}} shards="
      f"{{len(logits.addressable_shards)}} argmax0={{int(ref[0].argmax())}}")
"""


def test_two_process_sharded_decode():
    """Coordinator + 2 worker processes, 4 virtual CPU devices each: one
    dp x tp sharded decode step across the process boundary, local shards
    checked against a single-process reference (SURVEY §2.9 / BASELINE
    2-host north star — the collectives here really cross processes over
    the gRPC DCN analogue)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join("/tmp", "kuiper_mp_worker.py"), "w") as f:
        f.write(_WORKER.format(repo=repo))
    env = dict(os.environ, JAX_PLATFORMS="")
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "/tmp/kuiper_mp_worker.py", str(i), "2", "12431"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=240)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, (rc, out, err[-2000:])
    assert "OK pid=0" in outs[0][1], outs[0]
    assert "OK pid=1" in outs[1][1], outs[1]
