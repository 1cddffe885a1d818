"""Worker process for tests/test_multihost.py: one rank of a 2-process
CPU jax.distributed cluster (4 virtual devices each, 8 global) running the
real Trainer over a shared synthetic corpus.

argv: coordinator nproc pid corpus_dir out_dir n_iter device_corpus(0|1)
      [resume(0|1)]
"""

import os
import sys


def main():
    coordinator, nproc, pid, corpus_dir, out_dir, n_iter, device_corpus = sys.argv[1:8]
    resume = bool(int(sys.argv[8])) if len(sys.argv) > 8 else False
    # force exactly 4 virtual devices per process, replacing any inherited
    # count (the spawning pytest process runs with 8)
    import re

    flags = os.environ.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    # share compiled programs across workers/runs (single-core CI box)
    jax.config.update("jax_compilation_cache_dir", "/tmp/zeggs_jax_cpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.distributed.initialize(coordinator, int(nproc), int(pid))
    assert jax.process_count() == int(nproc)
    assert len(jax.devices()) == 4 * int(nproc)

    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from tests.test_multihost import trainer_opts
    from zeggs_tpu.io import checkpoint
    from zeggs_tpu.train.loop import Trainer

    corpus = Path(corpus_dir)
    out = Path(out_dir)
    trainer = Trainer(
        trainer_opts(resume=resume),
        # SHARED models dir, per the multi-host contract (shared
        # filesystem): rank 0 writes checkpoints, every rank resumes
        # from the same files
        models_dir=out / "models_shared",
        logs_dir=out / f"logs_p{pid}",
        path_processed_data=corpus / "processed" / "processed_data.npz",
        path_data_definition=corpus / "processed" / "data_definition.json",
        device_corpus=bool(int(device_corpus)),
    )
    if resume:
        assert trainer.iteration > 0, "resume found no checkpoint"
    trainer.run(max_iterations=int(n_iter), log_every=10**9)
    trainer.save_checkpoint()  # rank-0-gated internally
    if jax.process_index() == 0:
        checkpoint.save(out / "params_multihost.npz", jax.device_get(trainer.params))
    print(f"worker {pid}: done at iteration {trainer.iteration}", flush=True)


if __name__ == "__main__":
    main()
