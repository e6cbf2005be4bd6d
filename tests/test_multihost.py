"""Multi-host data parallelism: 2 real processes, 4 CPU devices each.

The TPU-native equivalent of the reference's multi-node DDP launch
(configs/RADMMM_train_config.yaml:27-30, SURVEY.md §2.7): each process
calls jax.distributed.initialize, builds the global 8-device mesh, loads a
*different* strided subset of batches, and assembles global batches with
jax.make_array_from_process_local_data. Gradient sync falls out of the
global-mean loss under GSPMD (gloo collectives on CPU).

Asserts the DDP invariants the reference never tests (SURVEY.md §4
"Multi-node: nothing is mocked"): identical final params on every process,
finite loss, rank-0-only logging, and a collectively written checkpoint.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys
sys.path.insert(0, {root!r})
pid = int(sys.argv[1])
import jax
from jax._src import xla_bridge as xb
xb._backend_factories.pop("axon", None)
jax.config.update("jax_platforms", "cpu")
# env var alone doesn't activate the persistent compile cache on this
# jax build; without it both child processes recompile everything
if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.distributed.initialize(coordinator_address="localhost:{port}",
                           num_processes=2, process_id=pid)
assert jax.device_count() == 8 and jax.local_device_count() == 4
import numpy as np
from radmmm_tpu.training.cli import build_all
from radmmm_tpu.utils.config import load_configs

cfg = load_configs([{model_yaml!r}, {data_yaml!r}])
cfg["model"]["output_directory"] = {outdir!r}
cfg["data"]["init_args"]["batchsize"] = 4
cfg["trainer"].update(max_steps=3, val_check_interval=3,
                      n_data=8, n_model=1, save_code_snapshot=False,
                      save_val_artifacts=False, val_prompts_path=None,
                      log_interval=1, griffin_lim_iters=2)
dm, trainer = build_all(cfg)
state = trainer.fit(dm, resume=False)
leaf = np.asarray(state.params["text_embeddings"]["embedding"])
wn = np.asarray(
    state.params["decoder"]["flow_0"]["coupling"]["wn"]["start"]["v"])
out = {{"pid": pid, "step": int(state.step),
       "leaf_sum": float(leaf.sum()), "wn_sum": float(wn.sum()),
       "ckpt_step": trainer.ckpt.latest_step(),
       "logger_enabled": trainer.logger.enabled}}
with open(os.path.join({outdir!r}, f"result_{{pid}}.json"), "w") as f:
    json.dump(out, f)
"""


@pytest.mark.slow
def test_two_process_ddp_fit(tmp_path):
    corpus = tmp_path / "corpus"
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts/make_demo_corpus.py"),
         str(corpus), "--n-train", "24", "--n-val", "8", "--tiny"],
        check=True, cwd=ROOT, env={**os.environ, "JAX_PLATFORMS": ""})

    env = {**os.environ,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
           "JAX_PLATFORMS": "cpu",
           "JAX_COMPILATION_CACHE_DIR":
               os.environ.get("JAX_COMPILATION_CACHE_DIR",
                              "/root/.jax_test_cache")}

    # one retry with a fresh port + run dir, gated on the failure being a
    # known coordination/port race (single-core CI boxes under load): a
    # genuine correctness regression fails immediately with its output
    RETRYABLE = ("DEADLINE_EXCEEDED", "UNAVAILABLE", "coordination",
                 "barrier", "failed to connect", "Connection refused",
                 "address already in use", "Address already in use")
    outdir = None
    for attempt in range(2):
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        outdir = str(tmp_path / f"run{attempt}")
        script = tmp_path / f"child{attempt}.py"
        script.write_text(CHILD.format(
            root=ROOT, port=port, model_yaml=str(corpus / "model.yaml"),
            data_yaml=str(corpus / "data.yaml"), outdir=outdir))
        procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                                  env=env, cwd=ROOT,
                                  stdout=subprocess.PIPE,
                                  stderr=subprocess.STDOUT)
                 for i in range(2)]
        outs = [p.communicate(timeout=1200)[0].decode() for p in procs]
        if all(p.returncode == 0 for p in procs):
            break
        failed = [o for p, o in zip(procs, outs) if p.returncode != 0]
        retryable = any(any(pat in o for pat in RETRYABLE) for o in failed)
        if attempt == 1 or not retryable:
            for p, o in zip(procs, outs):
                assert p.returncode == 0, o[-4000:]
        print(f"retrying multi-host fit: attempt {attempt} hit a known "
              "coordination race:\n" + failed[0][-1500:])

    results = {}
    for i in range(2):
        with open(os.path.join(outdir, f"result_{i}.json")) as f:
            results[i] = json.load(f)
    # the DDP invariant: every process ends with identical params
    assert results[0]["leaf_sum"] == results[1]["leaf_sum"]
    assert results[0]["wn_sum"] == results[1]["wn_sum"]
    assert np.isfinite(results[0]["leaf_sum"])
    assert results[0]["step"] == results[1]["step"] == 3
    # collectively written checkpoint, visible to both
    assert results[0]["ckpt_step"] == results[1]["ckpt_step"] == 3
    # rank-0-only logging
    assert results[0]["logger_enabled"] is True
    assert results[1]["logger_enabled"] is False
    metrics_path = os.path.join(outdir, "tb", "metrics.jsonl")
    assert os.path.exists(metrics_path)
    # validation ran at step 3 on the 2-process mesh: scalar metrics from
    # the sharded val path AND a sample image from _log_val_samples (which
    # broadcasts rank 0's batch before replicating — different per-process
    # batches must never be device_put into a replicated sharding)
    with open(metrics_path) as f:
        rows = [json.loads(line) for line in f]
    assert any(k.startswith("val/") for r in rows for k in r), rows
