"""Per-process ingestion cost probe (VERDICT r4 item 6).

Loads a STRUCTURE file through runtime/ingest.load_structure_distributed
under jax.distributed and reports, per process:

    shard_rows rss_delta_bytes rchar_delta_bytes

- rss_delta: /proc/self/status VmRSS growth across the load = RETAINED
  host+CPU-device memory (the shard's parse buffers + this process's
  addressable shards of the global arrays) - the O(I/n_processes) claim.
- rchar_delta: /proc/self/io rchar growth = bytes READ during the load.
  The metadata scan streams the whole file (row count), the range parse
  stops at the shard's last row (native reader early-stop), so process p
  of P reads ~ (1 + (p+1)/P) x filesize vs 2 x for a single process.

Usage: ingest_memory_driver.py <pid> <nproc> <port> <datafile> <outfile>
"""

import os
import sys


def _vm_rss() -> int:
    with open("/proc/self/status") as fh:
        for ln in fh:
            if ln.startswith("VmRSS:"):
                return int(ln.split()[1]) * 1024
    raise RuntimeError("no VmRSS")


def _rchar() -> int:
    with open("/proc/self/io") as fh:
        for ln in fh:
            if ln.startswith("rchar:"):
                return int(ln.split()[1])
    raise RuntimeError("no rchar")


def main() -> None:
    pid, nproc, port, data, out = sys.argv[1:6]
    pid, nproc = int(pid), int(nproc)
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(f"localhost:{port}", nproc, pid)

    import jax.numpy as jnp

    from multiclust_tpu.config import Options
    from multiclust_tpu.runtime.ingest import load_structure_distributed
    from multiclust_tpu.runtime.mesh import cached_mesh

    opt = Options(alleles_are_indices=True)
    mesh = cached_mesh((len(jax.devices()), 1))
    # settle allocator noise before measuring
    jnp.zeros((1,)).block_until_ready()
    rss0, rch0 = _vm_rss(), _rchar()
    md, info = load_structure_distributed(data, opt, mesh,
                                          dtype=jnp.float32,
                                          storage_dtype=jnp.int8)
    for leaf in (md.x, md.miss):
        leaf.block_until_ready()
    rss1, rch1 = _vm_rss(), _rchar()
    shard_rows = info.hi - info.lo
    with open(out, "w") as fh:
        fh.write(f"{shard_rows} {rss1 - rss0} {rch1 - rch0}\n")


if __name__ == "__main__":
    main()
