"""End-to-end CLI tests (reference-compatible flag surface)."""

import os

import numpy as np
import pytest

from multiclust_tpu.cli import main, parse_args, UsageError


@pytest.fixture
def toy_file(tmp_path, rng):
    from multiclust_tpu.stats.sim import simulate_mixture
    P = rng.dirichlet(np.full(3, 0.2), size=(3, 30))
    eta = np.array([0.3, 0.3, 0.4])
    ds, z = simulate_mixture(rng, eta, P, I=60, ploidy=2, missing_rate=0.05)
    path = tmp_path / "toy.str"
    with open(path, "w") as fh:
        fh.write(" ".join(f"loc{l}" for l in range(ds.L)) + "\n")
        for i in range(ds.I):
            for a in range(2):
                fh.write(f"ind{i} pop{i % 2} "
                         + " ".join(map(str, ds.IL[i * 2 + a])) + "\n")
    afile = tmp_path / "truth.txt"
    np.savetxt(afile, z + 1, fmt="%d")
    return str(path), str(afile), z


def test_parse_args_surface():
    opt = parse_args(["-f", "x.str", "-a", "-k", "4", "-n", "10",
                      "-s", "6", "-g", "5", "-c", "--bound", "1e-6",
                      "-m", "25", "-e", "1e-8", "-E", "1e-3",
                      "--projection", "-r", "99", "-p", "4"])
    assert opt.admixture and opt.eta_constrained
    assert opt.min_K == opt.max_K == 4
    assert opt.n_init == 10 and opt.n_rand_em_init == 25
    assert int(opt.accel_scheme) == 6      # resolved to QN q=3 later
    assert opt.adjust_step == 5
    assert opt.lower_bound == 1e-6
    assert opt.rel_error == 1e-8 and opt.abs_error == 1e-3
    assert not opt.do_projection
    assert opt.seed == 99 and opt.ploidy == 4
    sync = opt.synchronize(100, 4)
    assert int(sync.accel_scheme) == 4 and sync.q == 3
    assert sync.adjust_step == 0


def test_parse_check_interval():
    opt = parse_args(["-f", "x.str", "--check-interval", "8"])
    assert opt.check_interval == 8
    assert opt.checkpoint_dir is None      # prefix disambiguation intact
    opt2 = parse_args(["-f", "x.str", "--checkpoint", "ckpt/"])
    # default is 0 = adaptive (escalate/reset from measured logL deltas)
    assert opt2.checkpoint_dir == "ckpt/" and opt2.check_interval == 0
    assert parse_args(["-f", "x", "--check-interval", "0"]
                      ).check_interval == 0
    with pytest.raises(SystemExit):
        parse_args(["-f", "x", "--check-interval", "-1"])
    # per-iteration trace contract: verbosity > MINIMAL forces interval 1
    noisy = parse_args(["-f", "x.str", "--check-interval", "8",
                        "-v", "5"]).synchronize(100, 2)
    assert noisy.check_interval == 1
    # acceleration checks logL every macro step: interval pinned to 1 so
    # a stale value can't leak into future accelerated paths
    accel = parse_args(["-f", "x.str", "--check-interval", "8",
                        "-s", "1"]).synchronize(100, 2)
    assert accel.check_interval == 1


def test_parse_args_errors():
    with pytest.raises(SystemExit):
        parse_args([])                     # no -f
    with pytest.raises(SystemExit):
        parse_args(["-f"])                 # missing argument
    with pytest.raises(SystemExit):
        parse_args(["-f", "x", "-Z"])      # unknown flag
    with pytest.raises(SystemExit):
        parse_args(["-f", "x", "--format", "xml"])


def test_cli_mixture_fit(toy_file, tmp_path, capsys):
    path, afile, z = toy_file
    rc = main(["-f", path, "-k", "3", "-n", "3", "-d", str(tmp_path),
               "-A", afile, "-r", "42"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "mix 3" in out
    # output files exist with reference naming
    base = os.path.join(str(tmp_path), "toy.str")
    assert os.path.exists(base + ".mix.K=3.out.txt")
    assert os.path.exists(base + ".mix.K=3.etak.txt")
    assert os.path.exists(base + ".mix.K=3.pklm.txt")
    assert os.path.exists(base + "_mix_popq.popq")
    assert os.path.exists(base + ".mix.K=3.indivq")
    text = open(base + ".mix.K=3.out.txt").read()
    assert "logL = " in text and "AIC = " in text and "count.K" in text
    # per-init progress lines at default verbosity (multiclust.c:618-627)
    prog = [ln for ln in out.splitlines() if "initialization =" in ln]
    assert len(prog) == 3 and all("converged" in ln for ln in prog)
    # adjusted Rand on well-separated data should be near-perfect
    arand = float(out.strip().splitlines()[-1].split()[12])
    assert arand > 0.9


def test_cli_admixture_ksweep(toy_file, tmp_path, capsys):
    path, afile, _ = toy_file
    rc = main(["-f", path, "-1", "1", "-2", "3", "-n", "2", "-a",
               "-d", str(tmp_path), "-r", "7", "-s", "1"])
    assert rc == 0
    out = capsys.readouterr().out
    compact = [ln for ln in out.strip().splitlines()
               if "initialization =" not in ln]
    assert len(compact) == 3   # one compact line per K
    assert all(" admix " in ln for ln in compact)
    for K in (1, 2, 3):
        assert os.path.exists(
            os.path.join(str(tmp_path), f"toy.str.admix.K={K}.out.txt"))
        assert os.path.exists(
            os.path.join(str(tmp_path), f"toy.str_admix_popq_{K}.popq"))
    # logL must increase with K
    lls = [float(line.split()[9]) for line in compact]
    assert lls[0] < lls[1] < lls[2]


def test_cli_mesh_fit_matches_single_device(toy_file, tmp_path, capsys):
    """--mesh 4x2 drives the same fit over the virtual 8-device mesh and
    reproduces the single-device result (VERDICT round 1, item 1)."""
    path, _, _ = toy_file
    args = ["-f", path, "-a", "-k", "2", "-n", "2", "-r", "11",
            "-d", str(tmp_path)]
    assert main(args) == 0
    single = capsys.readouterr().out.strip().splitlines()[-1]
    assert main(args + ["--mesh", "4x2"]) == 0
    meshed = capsys.readouterr().out.strip().splitlines()[-1]
    ll_s = float(single.split()[9])
    ll_m = float(meshed.split()[9])
    # same optimum to a few f32 ulps (~1.2e-4 at |logL|~1750): mesh and
    # single-device trajectories diverge at the ulp level (different XLA
    # fusion under partitioning) and EM amplifies ulps chaotically, so
    # bitwise-identical converged logL is not a guaranteeable invariant;
    # a real sharding bug (wrong psum, dropped shard) is orders of
    # magnitude larger
    assert abs(ll_s - ll_m) < 1e-3
    # parse errors
    with pytest.raises(SystemExit):
        parse_args(["-f", "x", "--mesh", "bogus"])
    assert parse_args(["-f", "x", "--mesh", "auto"]).mesh_shape == (-1, 1)


def test_cli_parallel_mode(toy_file, tmp_path, capsys):
    path, _, _ = toy_file
    rc = main(["-f", path, "-k", "2", "-n", "2", "-M",
               "-d", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    float(out[-1])                         # last line is max_logL


def test_cli_simulate_roundtrip(tmp_path, rng):
    K, L, I = 2, 15, 20
    Q = rng.dirichlet(np.full(K, 2.0), size=I)
    p0 = rng.uniform(0.2, 0.8, size=(L, K))
    qf, pf, of = (str(tmp_path / n) for n in ("q.txt", "p.txt", "sim.str"))
    np.savetxt(qf, Q, fmt="%.8f")
    np.savetxt(pf, p0, fmt="%.8f")
    rc = main(["--simulate", qf, pf, of, "-r", "5"])
    assert rc == 0
    from multiclust_tpu.config import Options
    from multiclust_tpu.io.structure import read_structure
    ds = read_structure(of, Options(ploidy=2))
    assert ds.I == I and ds.L == L


def test_cli_bootstrap(toy_file, tmp_path, capsys, monkeypatch):
    path, _, _ = toy_file
    # the batched replicate engine must carry the -b replicates: no serial
    # per-replicate estimate_model calls beyond the observed fit
    import multiclust_tpu.runtime.ksweep as ksweep_mod
    import multiclust_tpu.stats.bootstrap as bs_mod
    calls = []
    real = ksweep_mod.estimate_model

    def counting(*a, **kw):
        calls.append(kw.get("bootstrap", False))
        return real(*a, **kw)

    monkeypatch.setattr(ksweep_mod, "estimate_model", counting)
    rc = main(["-f", path, "-k", "2", "-n", "1", "-b", "3",
               "-d", str(tmp_path), "-r", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "p-value to reject H0: K=1" in out
    assert "Bootstrap dataset 3 (of 3)" in out
    assert calls == [False]  # observed fit only; replicates ran batched


def test_bootstrap_batched_matches_serial_shapes(toy_file):
    """Batched replicate test statistics are finite and the p-value agrees
    with a direct count; chunking does not change the draw stream."""
    import jax
    import jax.numpy as jnp

    from multiclust_tpu.config import Options
    from multiclust_tpu.io.structure import read_structure
    from multiclust_tpu.model.common import model_data_from_dataset
    from multiclust_tpu.runtime.ksweep import estimate_model
    from multiclust_tpu.stats import bootstrap as bs

    path, _, _ = toy_file
    opt = Options(filename=path, max_K=2, min_K=2, n_init=2,
                  n_bootstrap=4, dtype="float64")
    ds = read_structure(path, opt)
    opt = opt.synchronize(ds.I, ds.ploidy)
    md = model_data_from_dataset(ds, dtype=jnp.float64)
    est = estimate_model(jax.random.PRNGKey(0), md, opt,
                         lambda K: ds.n_parameters(K, False, False),
                         bootstrap=True)
    res = bs.run_bootstrap(jax.random.PRNGKey(1), md, opt,
                           lambda K: ds.n_parameters(K, False, False),
                           est.ts, est.h0_params, ds.ploidy)
    assert len(res.ts_bs) == 4
    assert all(np.isfinite(t) for t in res.ts_bs)
    expected = sum(t >= est.ts for t in res.ts_bs) / 4
    assert res.pvalue == expected


def test_cli_mixture_warm_start(toy_file, tmp_path, capsys, rng):
    """-Q/-P warm-start the MIXTURE model too (our documented extension:
    the reference ignores them outside the admixture branch,
    rnd_init.c:72-85) - warm-started fits are deterministic."""
    from multiclust_tpu.stats.sim import simulate_mixture
    K, L = 3, 25
    while True:
        P = rng.uniform(0.2, 0.8, size=(K, L))
        P2 = np.stack([P, 1.0 - P], axis=2)
        ds, _ = simulate_mixture(rng, np.array([0.3, 0.3, 0.4]), P2, I=40,
                                 ploidy=2)
        if (ds.n_alleles == 2).all():
            break
    path = str(tmp_path / "bi.str")
    with open(path, "w") as fh:
        fh.write(" ".join(f"loc{l}" for l in range(ds.L)) + "\n")
        for i in range(ds.I):
            for a in range(2):
                fh.write(f"ind{i} pop0 "
                         + " ".join(map(str, ds.IL[i * 2 + a])) + "\n")
    qf, pf = str(tmp_path / "w.q"), str(tmp_path / "w.p")
    np.savetxt(qf, rng.dirichlet(np.full(K, 5.0))[None, :], fmt="%.17g")
    np.savetxt(pf, rng.uniform(0.2, 0.8, size=(L, K)), fmt="%.17g")
    lls = []
    for _ in range(2):
        rc = main(["-f", path, "-k", str(K), "-n", "1", "-Q", qf,
                   "-P", pf, "-d", str(tmp_path)])
        assert rc == 0
        lls.append(float(
            capsys.readouterr().out.strip().splitlines()[-1].split()[9]))
    assert lls[0] == lls[1]
    assert np.isfinite(lls[0])
    # non-biallelic data + -P is rejected with a clear error
    path3, _, _ = toy_file
    pf3 = str(tmp_path / "w3.p")
    np.savetxt(pf3, rng.uniform(0.2, 0.8, size=(30, K)), fmt="%.17g")
    with pytest.raises(SystemExit):
        main(["-f", path3, "-k", str(K), "-n", "1", "-Q", qf, "-P", pf3,
              "-d", str(tmp_path)])


def test_cli_timing_harness(toy_file, tmp_path, capsys):
    path, _, _ = toy_file
    rc = main(["-f", path, "-k", "2", "-n", "1", "-w", "n", "2",
               "-d", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Number of repetitions: 2 of 2" in out
    assert "Average log likelihood:" in out


def test_cli_target_regimes(toy_file, tmp_path, capsys):
    path, _, _ = toy_file
    # revisit-count stop: run until the best logL is seen twice
    rc = main(["-f", path, "-k", "2", "-u", "n", "2",
               "-d", str(tmp_path), "-r", "11"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1].split()
    assert int(out[16]) >= 2               # n_maxll_times column


def test_cli_verbose_trace(toy_file, tmp_path, capsys):
    """-v 4 (RESTRAINED) prints per-iteration trace lines to stderr in the
    reference's format (stop, em_alg.c:123-136)."""
    path, _, _ = toy_file
    rc = main(["-f", path, "-a", "-k", "2", "-n", "1", "-v", "4",
               "-d", str(tmp_path)])
    assert rc == 0
    err = capsys.readouterr().err
    import re
    lines = [ln for ln in err.splitlines()
             if re.match(r"^ *\d+ \((EM|S\d|Q\d)\): ", ln)]
    assert len(lines) > 3
    assert "(delta):" in lines[0]


def test_library_api(toy_file):
    from multiclust_tpu.api import fit_file
    path, _, _ = toy_file
    out = fit_file(path, admixture=True, min_K=2, max_K=3, n_init=2,
                   dtype="float64")
    assert out.estimate.aic_K in (2, 3)
    assert out.Q.shape[1] == out.estimate.aic_K
    assert np.allclose(out.P.sum(axis=2), 1.0, atol=1e-6)
    assert out.best.ever_converged


def test_message_taxonomy(tmp_path, capsys):
    """Error taxonomy + uniform message format (message.c:27-126,
    message.h:12-53): canned strings, file::function(line) prefix, the
    error code as exit status (multiclust.c:157-164)."""
    import io as _io

    from multiclust_tpu.messages import Err, MsgType, Verbosity, message

    buf = _io.StringIO()
    rc = message(buf, MsgType.ERROR, Err.FILE_NOT_FOUND, "nope.str")
    out = buf.getvalue()
    assert rc == int(Err.FILE_NOT_FOUND)
    assert out.startswith("ERROR [test_cli.py::test_message_taxonomy(")
    assert 'file "nope.str" not found' in out

    buf = _io.StringIO()
    message(buf, MsgType.WARNING, Err.OUT_OF_TIME, "3720")
    assert "out of time (limit 01:02m)" in buf.getvalue()

    assert Verbosity.MINIMAL == 3 and Verbosity.DEBUG == 7

    # missing data file -> FILE_OPEN_ERROR through main
    rc = main(["-f", str(tmp_path / "does-not-exist.str"), "-k", "2"])
    assert rc == int(Err.FILE_OPEN_ERROR)
    err = capsys.readouterr().err
    assert 'could not open file' in err and "ERROR [" in err

    # malformed STRUCTURE file -> FILE_FORMAT_ERROR taxonomy code
    bad = tmp_path / "bad.str"
    bad.write_text("loc0 loc1\n")
    rc = main(["-f", str(bad), "-k", "2"])
    assert rc == int(Err.FILE_FORMAT_ERROR)
    assert "invalid file format" in capsys.readouterr().err
