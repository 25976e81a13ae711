"""Experiment-layer tests: results store, plotting, drivers at tiny scale."""

import argparse
import os

import numpy as np
import pandas as pd
import pytest

from bayesian_coresets_tpu.experiments import results
from bayesian_coresets_tpu.experiments.cli import coreset_size_grid, step_sched


@pytest.fixture
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


class TestResults:
    def _args(self, **kw):
        ns = argparse.Namespace(alg="GIGA", trial=1, results_folder="results/",
                                verbosity="error", func=None)
        ns.__dict__.update(kw)
        return ns

    def test_save_and_memoize(self, workdir):
        args = self._args()
        assert not results.check_exists(args)
        results.save(args, Ms=np.array([1, 2, 4]), err=np.array([3.0, 2.0, 1.0]))
        assert results.check_exists(args)
        # different args -> different hash
        assert not results.check_exists(self._args(trial=2))

    def test_hash_excludes_plot_args(self):
        a1 = self._args()
        a2 = self._args()
        a2.plot_x = "Ms"
        a2.summarize = ["trial"]
        assert results.hash_namespace(a1) == results.hash_namespace(a2)

    def test_load_matching_filters(self, workdir):
        for trial in (1, 2):
            results.save(self._args(trial=trial), Ms=np.array([1, 2]),
                         err=np.array([2.0, 1.0]))
        df = results.load_matching({"alg": "GIGA", "results_folder": "results/"})
        assert len(df) == 4
        df1 = results.load_matching({"trial": 1, "results_folder": "results/"})
        assert len(df1) == 2

    def test_mismatched_lengths_rejected(self, workdir):
        with pytest.raises(ValueError):
            results.save(self._args(), Ms=np.array([1, 2]), err=np.array([1.0]))

    def test_manifest_aligns_different_namespaces(self, workdir):
        results.save(self._args(), Ms=np.array([1]), err=np.array([1.0]))
        results.save(self._args(extra_field=7, trial=3), Ms=np.array([1]),
                     err=np.array([1.0]))
        mf = pd.read_csv("results/manifest.csv")
        assert len(mf) == 2
        assert str(mf.iloc[0]["alg"]) == "GIGA"
        assert str(mf.iloc[1]["alg"]) == "GIGA"


class TestCLI:
    def test_step_sched_registry(self):
        assert abs(step_sched("inv")(1) - 0.5) < 1e-12
        assert abs(step_sched("const:0.3")(100) - 0.3) < 1e-12
        assert abs(step_sched("inv:2")(0) - 2.0) < 1e-12
        with pytest.raises(ValueError):
            step_sched("lambda i: i")  # eval'd lambdas are rejected

    def test_size_grid(self):
        Ms = coreset_size_grid(100, 5, "log")
        assert Ms[0] == 0 and Ms[-1] == 100
        assert (np.diff(Ms) > 0).all()


class TestDrivers:
    def test_gaussian_driver(self, workdir):
        from bayesian_coresets_tpu.experiments import gaussian as G
        G.main(["run", "--alg", "GIGA-OPT", "--trial", "1", "--data_dim", "10",
                "--data_num", "100", "--proj_dim", "50",
                "--coreset_size_max", "20", "--coreset_num_sizes", "3"])
        df = results.load_matching({"alg": "GIGA-OPT", "results_folder": "results/"})
        assert df is not None
        rkl = df["rklw"].to_numpy()
        assert rkl[-1] < rkl[0]
        # memoization: second run is a no-op (no exception, no duplicate)
        G.main(["run", "--alg", "GIGA-OPT", "--trial", "1", "--data_dim", "10",
                "--data_num", "100", "--proj_dim", "50",
                "--coreset_size_max", "20", "--coreset_num_sizes", "3"])
        assert len(pd.read_csv("results/manifest.csv")) == 1

    def test_linear_regression_driver(self, workdir):
        # reference examples/linear_regression/main.py analogue (synthetic
        # housing stand-in): rKL must improve with M and memoize
        from bayesian_coresets_tpu.experiments import linear_regression as LR
        argv = ["run", "--alg", "GIGA-OPT", "--trial", "1", "--data_num", "200",
                "--n_bases_per_scale", "5", "--proj_dim", "30",
                "--coreset_size_max", "30", "--coreset_num_sizes", "3"]
        LR.main(argv)
        df = results.load_matching({"alg": "GIGA-OPT", "results_folder": "results/"})
        rkl = df["rklw"].to_numpy()
        assert np.isfinite(rkl).all() and rkl[-1] < rkl[0]
        LR.main(argv)   # memoized rerun: no duplicate rows
        assert len(pd.read_csv("results/manifest.csv")) == 1

    def test_linear_regression_driver_sharded_int8(self, workdir):
        # --data_mesh / --select_dtype route the linreg GIGA build through
        # the shard_map SPMD path with the int8 selection copy
        from bayesian_coresets_tpu.experiments import linear_regression as LR
        LR.main(["run", "--alg", "GIGA-OPT", "--trial", "2", "--data_num", "256",
                 "--n_bases_per_scale", "5", "--proj_dim", "30",
                 "--coreset_size_max", "30", "--coreset_num_sizes", "3",
                 "--data_mesh", "4", "--select_dtype", "int8"])
        df = results.load_matching({"alg": "GIGA-OPT", "results_folder": "results/"})
        rkl = df["rklw"].to_numpy()
        assert np.isfinite(rkl).all() and rkl[-1] < rkl[0]

    def test_synthetic_vectors_driver_axis(self, workdir):
        from bayesian_coresets_tpu.experiments import synthetic_vectors as SV
        SV.main(["run", "--alg", "GIGA", "--trial", "1", "--data_num", "32",
                 "--data_type", "axis", "--coreset_size_max", "32",
                 "--coreset_num_sizes", "4"])
        df = results.load_matching({"alg": "GIGA", "results_folder": "results/"})
        err = df["err"].to_numpy()
        assert err[-1] < 1e-3 * np.sqrt(32)  # axis-aligned case is exact

    def test_plot_subcommand(self, workdir):
        from bayesian_coresets_tpu.experiments import synthetic_vectors as SV
        SV.main(["run", "--alg", "GIGA", "--trial", "1", "--data_num", "32",
                 "--data_type", "axis", "--coreset_size_max", "16",
                 "--coreset_num_sizes", "3"])
        SV.main(["plot", "Ms", "err", "--plot_legend", "alg", "--plot_out",
                 "out.png", "--data_num", "32", "--data_type", "axis",
                 "--coreset_size_max", "16", "--coreset_num_sizes", "3",
                 "--summarize", "trial"])
        assert os.path.exists("out.png")

    def test_simple_lr(self, workdir):
        from bayesian_coresets_tpu.experiments import simple_lr
        kl, coreset = simple_lr.main(N=500, D=4, projection_dim=100, M=50,
                                     verbose=False)
        assert np.isfinite(kl)
        assert kl < 5.0
        assert coreset.size() <= 50


class TestVisualize:
    def test_plot_housing_prices(self, workdir):
        # reference examples/data/plot_housing_prices.py analogue: price-
        # colored (lon, lat) scatter; runs on the synthetic stand-in when no
        # prices2018 data is given (the blob ships with neither repo)
        from bayesian_coresets_tpu.experiments.visualize import plot_housing_prices
        out = plot_housing_prices(out_path="housing.png", n=500)
        assert os.path.exists(out)
        # explicit data rows [lat, lon, price]: monotone color ramp in price
        data = np.column_stack([np.linspace(50, 55, 40),
                                np.linspace(-3, 1, 40),
                                np.geomspace(1e4, 1e6, 40)])
        out2 = plot_housing_prices(data=data, out_path="housing2.png")
        assert os.path.exists(out2)

    def test_visualize_main_housing(self, workdir, capsys):
        from bayesian_coresets_tpu.experiments import visualize
        visualize.main(["housing", "h.png"])
        assert os.path.exists("h.png")
        assert "wrote h.png" in capsys.readouterr().out


class TestLogisticPoissonDriver:
    def _tiny_lr(self, monkeypatch, n=120, d=3):
        """Monkeypatch the dataset loader: tiny synthetic logistic data."""
        from bayesian_coresets_tpu.experiments import datasets

        rng = np.random.default_rng(0)
        X = np.hstack([rng.normal(size=(n, d - 1)), np.ones((n, 1))])
        th = np.ones(d)
        Y = np.where(rng.uniform(size=n) < 1 / (1 + np.exp(-X @ th)), 1.0, -1.0)
        Z = (Y[:, None] * X).astype(np.float32)
        monkeypatch.setattr(datasets, "load_logistic",
                            lambda name: (X.astype(np.float32), Y, Z, None, d))

    def _argv(self, *flags, **kw):
        # ess_gate=1: tiny test chains (2 x 32 draws) can never reach the
        # production default of 100, and these tests target other behavior
        base = {"model": "lr", "dataset": "synth_lr", "alg": "GIGA-OPT",
                "trial": 1, "mcmc_samples_full": 32, "mcmc_samples_coreset": 32,
                "mcmc_chains": 2, "proj_dim": 32, "coreset_size_max": 16,
                "coreset_num_sizes": 2, "fs_samples": 16, "max_treedepth": 8,
                "ess_gate": 1}
        base.update(kw)
        return ["run"] + [x for k, v in base.items()
                          for x in (f"--{k}", str(v))] + list(flags)

    def test_cache_key_covers_mcmc_settings(self):
        from bayesian_coresets_tpu.experiments.logistic_poisson import full_cache_path
        base = argparse.Namespace(model="lr", dataset="synth_lr",
                                  mcmc_samples_full=1000, mcmc_chains=8,
                                  target_accept=0.9, max_treedepth=15, trial=1)
        p0 = full_cache_path(base)
        for field, val in [("mcmc_samples_full", 2000), ("mcmc_chains", 4),
                           ("target_accept", 0.8), ("trial", 2),
                           ("max_treedepth", 12), ("dataset", "phishing")]:
            ns = argparse.Namespace(**{**vars(base), field: val})
            assert full_cache_path(ns) != p0, field

    def test_driver_end_to_end_and_cache_rerun(self, workdir, monkeypatch):
        from bayesian_coresets_tpu.experiments import logistic_poisson as LP
        self._tiny_lr(monkeypatch)
        LP.main(self._argv())
        df = results.load_matching({"alg": "GIGA-OPT", "results_folder": "results/"})
        # diagnostics columns recorded; metrics finite; rKL improves with M
        for col in ("rhats", "esses", "full_rhat", "full_ess"):
            assert col in df.columns and np.isfinite(df[col]).all()
        rkl = df["rklw"].to_numpy()
        assert np.isfinite(rkl).all()
        caches = sorted(os.listdir("mcmc_cache"))
        assert len(caches) == 1
        # changing the full-data sample count MUST trigger a fresh MCMC run
        # (the reference's cache silently reused stale samples here)
        LP.main(self._argv(mcmc_samples_full=48))
        caches2 = sorted(os.listdir("mcmc_cache"))
        assert len(caches2) == 2 and caches[0] in caches2

    def test_ess_gate_triggers_dense_retry(self, workdir, monkeypatch, capsys):
        # Vehtari et al. gate BOTH R-hat and ESS: a run whose min bulk-ESS
        # falls below --ess_gate must visibly retry (dense mass matrix) and
        # warn if still under the gate — 2 chains x 32 draws cannot reach
        # an ESS of 10_000, so both paths must fire
        from bayesian_coresets_tpu.experiments import logistic_poisson as LP
        self._tiny_lr(monkeypatch)
        LP.main(self._argv(ess_gate=10_000, coreset_num_sizes=1))
        out = capsys.readouterr().out
        assert "retrying with dense mass matrix" in out
        assert "not converged" in out and "min ESS" in out
        # metrics are still recorded (gate warns, it does not drop rows)
        df = results.load_matching({"alg": "GIGA-OPT", "results_folder": "results/"})
        assert np.isfinite(df["rklw"].to_numpy()).all()

    def test_unconverged_gates_both_rhat_and_ess(self):
        from bayesian_coresets_tpu.experiments.logistic_poisson import (
            RHAT_GATE, unconverged)
        assert not unconverged(1.01, 500.0, 100.0)      # both gates pass
        assert unconverged(RHAT_GATE + 0.1, 500.0, 100.0)  # R-hat fails
        assert unconverged(1.01, 15.0, 100.0)           # ESS fails alone
        assert unconverged(1.01, 15.0)                  # default gate = 100

    def test_chain_mesh_driver(self, workdir, monkeypatch):
        # --chain_mesh routes full-data AND coreset NUTS through the chain
        # mesh (parallel/mcmc.py sharding) on the 8-device CPU mesh; chains
        # round up to a multiple of the device count and diagnostics still
        # gate/record
        from bayesian_coresets_tpu.experiments import logistic_poisson as LP
        self._tiny_lr(monkeypatch)
        LP.main(self._argv("--chain_mesh", mcmc_chains=8, coreset_num_sizes=1))
        df = results.load_matching({"alg": "GIGA-OPT", "results_folder": "results/"})
        for col in ("rhats", "esses", "full_rhat", "full_ess", "rklw"):
            assert col in df.columns and np.isfinite(df[col]).all()

    def test_data_mesh_driver(self, workdir, monkeypatch):
        # --data_mesh shards the dataset rows over the build mesh: the
        # GIGA build runs through the shard_map SPMD path (parallel/coreset)
        # while MCMC/metrics are unchanged; results must stay finite
        from bayesian_coresets_tpu.experiments import logistic_poisson as LP
        self._tiny_lr(monkeypatch, n=128)
        LP.main(self._argv(data_mesh=4, coreset_num_sizes=1))
        df = results.load_matching({"alg": "GIGA-OPT", "results_folder": "results/"})
        for col in ("rhats", "esses", "rklw"):
            assert col in df.columns and np.isfinite(df[col]).all()

    def test_svi_warm_start_driver(self, workdir, monkeypatch):
        # SVI routes through the warm-started Laplace refit (TangentFamily
        # make_ctx_warm); the coreset posterior must still track the full one
        from bayesian_coresets_tpu.experiments import logistic_poisson as LP
        self._tiny_lr(monkeypatch)
        LP.main(self._argv(alg="SVI", opt_itrs=20, mcmc_samples_coreset=64))
        df = results.load_matching({"alg": "SVI", "results_folder": "results/"})
        assert np.isfinite(df["rklw"].to_numpy()).all()
        assert df["mu_errs"].to_numpy()[-1] < 0.6
