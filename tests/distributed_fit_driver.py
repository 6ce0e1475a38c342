"""Multi-process fit driver (spawned by test_distributed.py).

Each process: initialize jax.distributed -> parse ONLY its row shard of
the STRUCTURE file (runtime/ingest.load_structure_distributed) -> run
the production multi-start engine over the global (data, model) mesh ->
report max_logL.  Usage:

    python distributed_fit_driver.py <pid> <nproc> <port> <data> <out> \
        [mesh_dd] [mesh_mm]
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count="
                           + os.environ.get("DRIVER_LOCAL_DEVICES", "4"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    data_path, out_path = sys.argv[4], sys.argv[5]
    dd = int(sys.argv[6]) if len(sys.argv) > 6 else 8
    mm = int(sys.argv[7]) if len(sys.argv) > 7 else 1
    if nproc > 1:
        from multiclust_tpu.runtime.mesh import initialize_distributed
        initialize_distributed(f"localhost:{port}", num_processes=nproc,
                               process_id=pid)

    import numpy as np

    from multiclust_tpu.config import Options
    from multiclust_tpu.runtime.ingest import codes_distributed, \
        load_structure_distributed
    from multiclust_tpu.runtime.mesh import cached_mesh
    from multiclust_tpu.runtime.multistart import maximize_likelihood

    opt = Options(admixture=True, alleles_are_indices=True, n_init=2,
                  batch_chains=2, min_K=2, max_K=2, n_rand_em_init=2,
                  dtype="float64")
    # DRIVER_N_SECONDS: wall-clock stop regime (-t) - exercises the
    # process-synced clock decisions (runtime/mesh.sync_host_flag)
    if os.environ.get("DRIVER_N_SECONDS"):
        opt.n_seconds = float(os.environ["DRIVER_N_SECONDS"])
        opt.n_init = 10_000  # time regime, not count, ends the run
    mesh = cached_mesh((dd, mm))
    md, info = load_structure_distributed(data_path, opt, mesh,
                                          dtype=np.float64)
    lo, hi, I_total = info.lo, info.hi, info.I_total
    opt.mesh_shape = (dd, mm)
    opt = opt.synchronize(I_total, opt.ploidy)
    codes = codes_distributed(md, info, opt, mesh)

    res = maximize_likelihood(
        jax.random.PRNGKey(7), md, 2, opt,
        n_parameters=int(2 * md.x.shape[1] + I_total), codes=codes)

    with open(out_path, "w") as fh:
        fh.write(f"{res.max_logL!r} {res.n_launched} {int(res.ever_converged)} "
                 f"{lo} {hi}\n")
    print(f"pid {pid}: max_logL={res.max_logL} inits={res.n_launched}",
          flush=True)


if __name__ == "__main__":
    main()
