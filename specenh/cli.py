"""Command-line interface — the reference's ``__main__`` scripts as
subcommands.

    specenh build-data   <- python spec_denoising/pipeline_data.py
    specenh train        <- python VAE/hyperparam_scan.py (one config)
    specenh sweep        <- VAE/manual_scan.py / manual_scan_3layers.py /
                            the SLURM kernel array (now vmapped on-device)
    specenh denoise      <- denoising_by_svd.ipynb / model inference
    specenh bench        <- the spectrograms/sec/chip harness
    specenh movie        <- graphs.ipynb cells 18-19
    specenh synth-shots  -- synthetic raw campaign generator (demo/testing)

Artifact set matches the reference per run directory: keras-style model dir,
ex_specs.png, val_loss.png/.txt, val_losses.npy, loss_comparisons.npz,
plot_chn_<i>.png, t_pred.txt (SURVEY.md section 2 #27-29).
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import time

import numpy as np

from specenh.config import MODEL_PRESETS, Config, SpecParams, SweepConfig, TrainConfig


def _cfg_from_args(args) -> Config:
    cfg = Config()
    if getattr(args, "cut_shot", None):
        import dataclasses

        cfg = dataclasses.replace(cfg, spec=dataclasses.replace(cfg.spec, cut_shot=args.cut_shot))
    return cfg


# ---------------------------------------------------------------------------


def cmd_build_data(args):
    cfg = _cfg_from_args(args)
    import glob as _glob

    if not args.binary and args.writers != 1:
        # same policy as cmd_sweep's stray-axis guard: a flag the selected
        # path never reads is an error, not a silent no-op
        raise SystemExit(
            "--writers applies to the streaming (--binary) campaign; the "
            "pickle path is the reference-parity synchronous loop"
        )
    if args.binary:
        from specenh.pipeline import build_dataset_streaming

        files = sorted(_glob.glob(os.path.join(args.data_dir, "*.bin")))
        summary = build_dataset_streaming(
            cfg, files, n_channels=args.channels, store_path=args.out,
            writers=args.writers, verbose=not args.quiet,
        )
    else:
        from specenh.pipeline import build_dataset

        files = (
            sorted(_glob.glob(os.path.join(args.data_dir, "*.pkl")))
            if args.data_dir else None
        )
        summary = build_dataset(
            cfg,
            shot_files=files,
            channels=list(range(1, args.channels + 1)),
            store_path=args.out,
            verbose=not args.quiet,
        )
    print(json.dumps(summary))


def cmd_merge_shards(args):
    """Fold a writer-pool store's sidecar shards into one HDF5 file."""
    from specenh.io.store import consolidate_shards

    n = consolidate_shards(
        args.store, out_path=args.out, remove=not args.keep_shards
    )
    print(json.dumps({"channels_merged": n, "out": args.out or args.store}))


def cmd_convert_bin(args):
    """pickle shots -> SPEC binary (native streaming fast path)."""
    import glob as _glob

    from specenh.io.binfmt import convert_ece_pickle

    os.makedirs(args.out_dir, exist_ok=True)
    channels = list(range(1, args.channels + 1))
    n = 0
    for pkl in sorted(_glob.glob(os.path.join(args.data_dir, "*.pkl"))):
        base = os.path.splitext(os.path.basename(pkl))[0] + ".bin"
        convert_ece_pickle(pkl, os.path.join(args.out_dir, base), channels)
        n += 1
    print(json.dumps({"converted": n}))


def cmd_synth_shots(args):
    """Generate synthetic raw ECE pickle shots (chirp + tone + noise) so the
    whole stack can run without DIII-D data access."""
    from specenh.data.dataset import synthetic_shot_batch
    from specenh.io.shots import ece_key

    os.makedirs(args.out, exist_ok=True)
    batch = synthetic_shot_batch(
        n_shots=args.shots, n_channels=args.channels, n_samples=args.samples, seed=args.seed
    )
    for s in range(args.shots):
        shot = 100000 + args.seed * 1000 + s
        data = {ece_key(c + 1): batch[s, c] for c in range(args.channels)}
        path = os.path.join(args.out, f"ece_{shot}.pkl")
        with open(path, "wb") as fh:
            pickle.dump(data, fh)
        print(path)


def cmd_train(args):
    import jax.numpy as jnp

    from specenh.config import PatchSpec
    from specenh.data.dataset import assemble_from_store
    from specenh.data.tiles import n_tiles_for, patch, unpatch
    from specenh.io.store import SpectrogramStore
    from specenh.train import create_state, fit, predict, save_model
    from specenh.viz.plots import display, plt_spec_shot, plot_val_loss

    model_cfg = MODEL_PRESETS[args.model]
    train_cfg = TrainConfig(
        epochs=args.epochs, seed=args.seed, split_by=args.split_by,
        batch_size=args.batch_size, learning_rate=args.lr,
        patience=args.patience,
    )
    os.makedirs(args.out_dir, exist_ok=True)

    store = SpectrogramStore(args.dataset, "r")
    # metadata-only: spec_shape reads no data (the old read_channel here
    # pulled 4 full datasets just for one shape)
    _shot0 = store.shots()[0]
    k_tiles = n_tiles_for(
        store.spec_shape(_shot0, store.channels_of(_shot0)[0])[-1], PatchSpec()
    )

    # Stream the epoch when the resident tile tensors would not fit on the
    # chip (the reference's 200-shot recipe is ~31 GB vs 16 GB v5e HBM;
    # manual_scan.py:137-156).  'auto' sizes the dataset from store
    # metadata only.
    from specenh.train_stream import (
        estimate_resident_bytes,
        fit_streaming,
        plan_stream_split,
    )

    plan = plan_stream_split(
        store, num_samples=args.num_shots, cfg=train_cfg, seed=args.seed
    )
    n_total = sum(plan.n_tiles(s) for s in ("train", "tune", "test"))
    budget = float(os.environ.get("SPECENH_HBM_BUDGET_GB", "12")) * 2**30
    use_stream = args.stream == "always" or (
        args.stream == "auto" and estimate_resident_bytes(n_total) > budget
    )
    devices = getattr(args, "devices", 0) or 0
    stream_mesh = None
    if use_stream and devices > 1:
        if (args.stream == "auto"
                and estimate_resident_bytes(n_total) / devices <= budget):
            # sharded over the mesh the dataset IS resident (each chip
            # holds 1/n of the tiles) — prefer the multi-chip path the
            # user asked for over single-chip streaming
            use_stream = False
            if not args.quiet:
                print(f"dataset fits sharded over {devices} devices; "
                      "using dp_fit instead of streaming")
        else:
            # too big even for the mesh's aggregate HBM: stream chunks
            # AND shard each one over the 'data' mesh
            from specenh.parallel.mesh import make_mesh

            stream_mesh = make_mesh(devices, ("data",))
            if not args.quiet:
                print(f"streaming chunks sharded over {devices} devices")

    if (args.chunk_tiles or args.chunk_dtype or args.tile_cache) \
            and not use_stream:
        # stray-flag policy (see cmd_sweep): a knob the selected path never
        # reads is an error, not a silent no-op
        raise SystemExit(
            "--chunk-tiles/--chunk-dtype/--tile-cache apply to the streamed "
            "epoch only; this run is resident (dataset fits the HBM budget) "
            "— use --stream always to force streaming"
        )
    engine = getattr(args, "engine", None) or (
        "bf16" if getattr(args, "bf16", False) else "f32"
    )
    state = create_state(
        model_cfg, train_cfg,
        dtype=jnp.bfloat16 if engine == "bf16" else None,
    )
    epoch_fn = None
    if engine == "kernel":
        import jax

        from specenh.ops.ae3_kernel import supports3 as _tk_supports3
        from specenh.ops.ae_train_kernel import supports as _tk_supports
        from specenh.train import kernel_epoch_for

        if not (_tk_supports(model_cfg) or _tk_supports3(model_cfg)):
            raise SystemExit(
                f"--engine kernel does not support the '{args.model}' "
                "geometry; use f32/bf16"
            )
        # interpret mode keeps the CLI usable on CPU (tests); real chips
        # run the compiled kernel.  devices > 1 routes through the
        # shard_map'd data-parallel kernel engine instead (built in the
        # dp branch below — it needs the mesh; for a sharded STREAM the
        # mesh already exists here).
        on_cpu = jax.default_backend() == "cpu"
        if stream_mesh is not None:
            from specenh.parallel.dp_kernel import dp_kernel_epoch_for

            epoch_fn = dp_kernel_epoch_for(
                model_cfg, train_cfg, stream_mesh,
                interpret=on_cpu,
                dtype=jnp.float32 if on_cpu else None,
            )
        elif not (devices > 1 and not use_stream):
            epoch_fn = kernel_epoch_for(
                model_cfg, train_cfg,
                interpret=on_cpu,
            )
    fit_common = dict(
        metrics_path=os.path.join(args.out_dir, "metrics.jsonl"),
        checkpoint_dir=os.path.join(args.out_dir, "checkpoints") if args.checkpoints else None,
        resume=args.resume,
        verbose=not args.quiet,
    )
    import contextlib

    trace_cm = contextlib.nullcontext()
    if getattr(args, "trace_dir", None):
        from specenh.utils.logging import profile_trace

        trace_cm = profile_trace(args.trace_dir)
    if use_stream:
        if not args.quiet:
            print(f"streaming {plan.n_tiles('train')} train tiles "
                  f"(resident estimate {estimate_resident_bytes(n_total)/2**30:.1f} GB "
                  f"> budget {budget/2**30:.1f} GB)" if args.stream == "auto"
                  else "streaming (forced)")
        with trace_cm:
            state, hist = fit_streaming(state, store, plan, train_cfg,
                                        chunk_tiles=args.chunk_tiles or 4096,
                                        epoch_fn=epoch_fn, mesh=stream_mesh,
                                        cache=args.stream_cache,
                                        cache_dtype=args.chunk_dtype,
                                        tile_cache=args.tile_cache,
                                        **fit_common)
        # bounded test sample for the display artifacts (the full test
        # split may not fit in host/device memory on streamed campaigns);
        # an empty test split (tiny datasets: int(n*0.85) == n) just skips
        # the display block below.  With --tile-cache the test split rides
        # the memmap path like train/tune: the first run builds
        # <base>.test.tiles in one store pass, later runs (sweeps,
        # re-recipes) do zero HDF5 data reads for the artifact stage.
        x_test = None
        if plan.n_tiles("test"):
            if args.tile_cache:
                from specenh.data.tilecache import open_or_build

                tc_dtype = "bf16" if args.chunk_dtype == "bf16" else "f32"
                r_test = open_or_build(
                    store, plan.test, args.tile_cache, "test", PatchSpec(),
                    tc_dtype, verbose=not args.quiet,
                )
                x_test = np.asarray(r_test.read(0, min(512, r_test.n))[0],
                                    np.float32)
            else:
                from specenh.train_stream import _iter_chunks

                chunk = next(_iter_chunks(store, plan.test, PatchSpec(), 512),
                             None)
                x_test = chunk[0] if chunk is not None else None
    elif devices > 1:
        from specenh.parallel.data_parallel import dp_fit
        from specenh.parallel.mesh import make_mesh

        splits = assemble_from_store(
            store, num_samples=args.num_shots, cfg=train_cfg, seed=args.seed
        ).reshaped()
        mesh = make_mesh(args.devices, ("data",))
        if engine == "kernel":
            import jax

            from specenh.parallel.dp_kernel import dp_kernel_epoch_for

            # CPU shim: interpret mode, f32 dots (XLA:CPU's runtime
            # rejects bf16 DotThunks at tiny per-device batch shapes);
            # real chips run the compiled bf16 kernel
            on_cpu = jax.default_backend() == "cpu"
            epoch_fn = dp_kernel_epoch_for(
                model_cfg, train_cfg, mesh,
                interpret=on_cpu,
                dtype=jnp.float32 if on_cpu else None,
            )
        with trace_cm:
            state, hist = dp_fit(
                state, splits.x_train, splits.y_train, mesh,
                splits.x_tune, splits.y_tune,
                epochs=args.epochs, batch_size=train_cfg.batch_size,
                seed=args.seed, epoch_fn=epoch_fn,
                patience=train_cfg.patience, **fit_common,
            )
        x_test = splits.x_test
    else:
        splits = assemble_from_store(
            store, num_samples=args.num_shots, cfg=train_cfg, seed=args.seed
        ).reshaped()
        with trace_cm:
            state, hist = fit(
                state,
                splits.x_train, splits.y_train, splits.x_tune, splits.y_tune,
                train_cfg,
                epoch_fn=epoch_fn,
                **fit_common,
            )
        x_test = splits.x_test
    save_model(state, os.path.join(args.out_dir, "model"), model_cfg)
    if not hist["val_loss"] or hist.get("new_epochs", 1) == 0:
        # resumed a fully-finished run: nothing new to report (the restored
        # loss history is non-empty, so check the new-epoch count)
        print(json.dumps({"resumed": "already complete"}))
        store.close()
        return

    # predictions + display artifact (hyperparam_scan.py:194-205); skipped
    # when the test split is too small to restitch one full spectrogram
    sample_shot = store.shots()[0]
    if x_test is not None and x_test.shape[0] >= k_tiles:
        preds = np.squeeze(np.asarray(predict(state, jnp.asarray(x_test))), -1)
        noisy = np.asarray(unpatch(jnp.asarray(np.squeeze(x_test, -1)), tiles_per_spec=k_tiles))
        final = np.asarray(unpatch(jnp.asarray(preds), tiles_per_spec=k_tiles))
        d = store.read_axes(sample_shot, 1)  # axes only: no spec data read
        display(noisy, final, os.path.join(args.out_dir, "ex_specs.png"), d["f"], d["t"], seed=0)
    elif not args.quiet:
        print("test split too small for ex_specs.png; skipped")
    plot_val_loss(
        hist["val_loss"],
        os.path.join(args.out_dir, "val_loss.png"),
        os.path.join(args.out_dir, "val_loss.txt"),
    )

    # timed per-channel inference on a reference shot (hyperparam_scan.py:214-244)
    # — timed on the PRODUCTION path (fused Pallas kernel where the geometry
    # is covered, Flax otherwise), like the reference times its own serving
    # path; sweep's pred_times already does the same.
    import jax

    from specenh.bench.harness import make_production_predict_fn

    prod_predict = make_production_predict_fn(model_cfg)
    # pre-scattered weight handle: production-serving configuration
    prod_params = prod_predict.prepare(state.params)
    shot_key = f"ece_{args.bench_shot}" if f"ece_{args.bench_shot}" in store.shots() else sample_shot
    t_predict = 0.0
    chns = store.channels_of(shot_key)

    # --tile-cache: the bench shot's (spec, pipeline_out) tiles ride the
    # memmap path too — a <base>.bench.tiles cache built once, so repeat
    # runs' t_pred/plot_chn stage does zero HDF5 data reads (only the
    # KB-scale f/t axes come from the store)
    bench_reader = None
    if use_stream and args.tile_cache:
        from specenh.data.grain_pipeline import RecordSlice
        from specenh.data.tilecache import open_or_build
        from specenh.data.tiles import n_tiles_for

        ks = [n_tiles_for(store.spec_shape(shot_key, i)[-1], PatchSpec())
              for i in chns]
        bench_plan = [RecordSlice(shot_key, i, 0, k)
                      for i, k in zip(chns, ks)]
        tc_dtype = "bf16" if args.chunk_dtype == "bf16" else "f32"
        bench_reader = open_or_build(
            store, bench_plan, args.tile_cache, "bench", PatchSpec(),
            tc_dtype, verbose=not args.quiet,
        )
        bench_offs = np.concatenate([[0], np.cumsum(ks)])

    for j, i in enumerate(chns):
        if bench_reader is not None:
            tiles = np.asarray(
                bench_reader.read_x(int(bench_offs[j]),
                                    int(bench_offs[j + 1])), np.float32)
        else:
            d = store.read_channel(shot_key, i)
            tiles = np.asarray(patch(jnp.asarray(d["spec"][None])))[..., None]
        start = time.time()
        p = prod_predict(prod_params, jnp.asarray(tiles))
        np.asarray(p.ravel()[:1])  # sync (tunnelled TPU: block_until_ready lies)
        t_predict += time.time() - start
        p = jnp.asarray(p, jnp.float32)  # bf16-path outputs -> plottable
        if i in (10, 11, 12):
            # label tiles read lazily: only these 3 channels plot them
            if bench_reader is not None:
                pipe_tiles = np.asarray(
                    bench_reader.read_y(int(bench_offs[j]),
                                        int(bench_offs[j + 1])),
                    np.float32)[..., 0]
            else:
                pipe_tiles = np.asarray(patch(jnp.asarray(d["pipeline_out"][None])))
            ax = store.read_axes(shot_key, i)
            plt_spec_shot(
                np.asarray(unpatch(jnp.asarray(tiles[..., 0]), tiles_per_spec=k_tiles))[0],
                np.asarray(unpatch(jnp.squeeze(p, -1), tiles_per_spec=k_tiles))[0],
                np.asarray(unpatch(jnp.asarray(pipe_tiles), tiles_per_spec=k_tiles))[0],
                shot_key, i, os.path.join(args.out_dir, f"plot_chn_{i}.png"),
                ax["f"], ax["t"],
            )
    t_predict /= max(len(chns), 1)
    with open(os.path.join(args.out_dir, "t_pred.txt"), "w") as fh:
        fh.write(str(t_predict))
        fh.write(str(len(jax.devices())))
    store.close()
    print(json.dumps({"val_loss": hist["val_loss"][-1], "t_pred": t_predict}))


def cmd_train_raw(args):
    """Device-resident fast path: raw shots -> trained model, no HDF5
    round-trip (specenh.e2e)."""
    import glob as _glob

    import jax.numpy as jnp

    from specenh.e2e import train_from_raw
    from specenh.io.native import read_shot
    from specenh.io.shots import read_ece_channels
    from specenh.train import save_model

    cfg = _cfg_from_args(args)
    model_cfg = MODEL_PRESETS[args.model]
    traces = []
    if args.binary:
        for p in sorted(_glob.glob(os.path.join(args.data_dir, "*.bin"))):
            traces.append(read_shot(p, args.channels, cfg.spec.n_samples))
    else:
        for p in sorted(_glob.glob(os.path.join(args.data_dir, "*.pkl"))):
            traces.append(
                read_ece_channels(p, list(range(1, args.channels + 1)), cfg.spec.n_samples)
            )
    traces = np.concatenate(traces, axis=0)
    train_cfg = TrainConfig(
        epochs=args.epochs, seed=args.seed, split_by=args.split_by,
        batch_size=args.batch_size, learning_rate=args.lr,
        patience=args.patience,
    )
    engine = getattr(args, "engine", None) or "f32"
    mesh = None
    if getattr(args, "devices", 0) and args.devices > 1:
        from specenh.parallel.mesh import make_mesh

        mesh = make_mesh(args.devices, ("data",))
    epoch_fn = None
    if engine == "kernel":
        import jax

        from specenh.ops.ae3_kernel import supports3 as _tk_supports3
        from specenh.ops.ae_train_kernel import supports as _tk_supports
        from specenh.train import kernel_epoch_for

        if not (_tk_supports(model_cfg) or _tk_supports3(model_cfg)):
            raise SystemExit(
                f"--engine kernel does not support the '{args.model}' "
                "geometry; use f32/bf16"
            )
        on_cpu = jax.default_backend() == "cpu"
        if mesh is not None:
            from specenh.parallel.dp_kernel import dp_kernel_epoch_for

            epoch_fn = dp_kernel_epoch_for(
                model_cfg, train_cfg, mesh,
                interpret=on_cpu,
                dtype=jnp.float32 if on_cpu else None,
            )
        else:
            epoch_fn = kernel_epoch_for(
                model_cfg, train_cfg, interpret=on_cpu,
            )
    state, hist = train_from_raw(
        traces, cfg, model_cfg,
        train_cfg,
        # shot-major stacking above: each file contributed args.channels
        # traces, so the leak-free split groups them back into shots
        channels_per_shot=args.channels,
        dtype=jnp.bfloat16 if engine == "bf16" else None,
        epoch_fn=epoch_fn,
        mesh=mesh,
        verbose=not args.quiet,
    )
    os.makedirs(args.out_dir, exist_ok=True)
    save_model(state, os.path.join(args.out_dir, "model"), model_cfg)
    print(json.dumps({"val_loss": hist["val_loss"][-1], "channels": int(traces.shape[0])}))


def cmd_sweep(args):
    import jax.numpy as jnp

    from specenh.data.dataset import assemble_from_store
    from specenh.io.store import SpectrogramStore
    from specenh.sweep import (
        expand_grid_2layer,
        expand_grid_3layer,
        save_loss_comparisons,
        sweep_fit,
    )
    from specenh.train import create_state, save_model
    from specenh.viz.plots import plot_val_loss

    def _kers(s):
        return tuple((int(v), int(v)) for v in s.split(","))

    def _ints(s):
        return tuple(int(v) for v in s.split(","))

    # grid-axis overrides: the reference user edits the scan scripts'
    # constants (hyperparam_scan.py:123, manual_scan.py:120-124,
    # manual_scan_3layers.py:119-123); here they are flags.  Flags that
    # the selected grid does not read are an error, not a silent no-op —
    # otherwise an expensive sweep quietly trains the wrong configs.
    applicable = {
        "kernel": {"kernel_vals"},
        "2layer": {"ker1", "ker2", "ker3", "conv1", "conv2"},
        "3layer": {"ker", "conv1", "conv2", "conv3"},
    }[args.grid]
    all_axes = {"kernel_vals", "ker", "ker1", "ker2", "ker3",
                "conv1", "conv2", "conv3"}
    stray = sorted(ax for ax in all_axes - applicable if getattr(args, ax, None))
    if stray:
        flags = ", ".join("--" + s.replace("_", "-") for s in stray)
        raise SystemExit(
            f"{flags}: not an axis of --grid {args.grid} (its axes: "
            + ", ".join("--" + s.replace("_", "-") for s in sorted(applicable))
            + ")"
        )
    over = {}
    if args.kernel_vals:
        over["kernel_vals"] = _kers(args.kernel_vals)
    if args.grid == "3layer":
        if args.ker:
            over["ker_vals_3layer"] = _kers(args.ker)
        for ax in ("conv1", "conv2", "conv3"):
            if getattr(args, ax):
                over[f"{ax}_vals_3layer"] = _ints(getattr(args, ax))
    elif args.grid == "2layer":
        for ax in ("ker1", "ker2", "ker3"):
            if getattr(args, ax):
                over[f"{ax}_vals"] = _kers(getattr(args, ax))
        for ax in ("conv1", "conv2"):
            if getattr(args, ax):
                over[f"{ax}_vals"] = _ints(getattr(args, ax))
    sw = SweepConfig(epochs=args.epochs, **over)
    if args.grid == "kernel":
        from specenh.config import ModelConfig

        configs = [
            ModelConfig(filters=(32, 32), kernels=(k, k), out_kernel=k)
            for k in sw.kernel_vals
        ]
        grid_shape, names = (len(configs),), ["kernel"]
    elif args.grid == "3layer":
        configs, grid_shape = expand_grid_3layer(sw)
        names = ["ker", "conv1", "conv2", "conv3"]
    else:
        configs, grid_shape = expand_grid_2layer(sw)
        names = ["ker1", "ker2", "ker3", "conv1", "conv2"]

    train_cfg = TrainConfig(
        epochs=args.epochs, seed=args.seed, split_by=args.split_by,
        batch_size=args.batch_size, learning_rate=args.lr,
        patience=args.patience,
    )
    os.makedirs(args.out_dir, exist_ok=True)
    engine = getattr(args, "engine", "envelope")
    store = SpectrogramStore(args.dataset, "r")

    # streamed sweeps (the 200-shot recipe's ~31 GB tile set cannot be
    # assembled resident on one chip): decided from store METADATA like
    # cmd_train.  Only the serial kernel engine streams (per-config
    # fit_streaming); the vmapped envelope needs the resident dataset.
    from specenh.train_stream import (
        estimate_resident_bytes,
        plan_stream_split,
    )

    plan = plan_stream_split(
        store, num_samples=args.num_shots, cfg=train_cfg, seed=args.seed
    )
    n_total = sum(plan.n_tiles(s) for s in ("train", "tune", "test"))
    budget = float(os.environ.get("SPECENH_HBM_BUDGET_GB", "12")) * 2**30
    use_stream = args.stream == "always" or (
        args.stream == "auto" and estimate_resident_bytes(n_total) > budget
    )
    if use_stream and engine != "kernel":
        raise SystemExit(
            "this sweep's dataset exceeds the resident budget (or --stream "
            "always was given): streamed sweeps run per-config on the "
            "serial engine — add --engine kernel (the vmapped envelope "
            "needs the resident dataset)"
        )
    if (args.chunk_tiles or args.chunk_dtype or args.tile_cache) \
            and not use_stream:
        raise SystemExit(
            "--chunk-tiles/--chunk-dtype/--tile-cache apply to the "
            "streamed sweep only; this grid is resident — use --stream "
            "always to force streaming"
        )
    mesh = None
    if getattr(args, "devices", 0) and args.devices > 1:
        from specenh.parallel.mesh import make_mesh

        # the envelope engine shards the CONFIG axis over the mesh (the
        # SLURM-array analog); the serial kernel engine trains configs
        # sequentially, each DATA-parallel over the same chips
        mesh = make_mesh(args.devices,
                         ("data",) if engine == "kernel" else ("sweep",))
    ckpt_dir = os.path.join(args.out_dir, "checkpoints") if args.checkpoints else None
    if use_stream:
        import jax

        from specenh.sweep import sweep_fit_serial_streamed

        if not args.quiet:
            print(f"streaming sweep: {plan.n_tiles('train')} train tiles "
                  f"per config over {len(configs)} configs")
        res = sweep_fit_serial_streamed(
            configs, store, plan, train_cfg, epochs=args.epochs,
            dtype=jnp.bfloat16 if getattr(args, "bf16", False) else None,
            checkpoint_dir=ckpt_dir, resume=args.resume, mesh=mesh,
            chunk_tiles=args.chunk_tiles or 4096,
            cache_dtype=args.chunk_dtype, tile_cache=args.tile_cache,
            interpret=jax.default_backend() == "cpu",
            verbose=not args.quiet,
        )
        splits = None
    else:
        splits = assemble_from_store(
            store, num_samples=args.num_shots, cfg=train_cfg, seed=args.seed
        ).reshaped()
        if engine == "kernel":
            from specenh.sweep import sweep_fit_serial

            res = sweep_fit_serial(
                configs, splits.x_train, splits.y_train, splits.x_tune,
                splits.y_tune, train_cfg, epochs=args.epochs,
                dtype=jnp.bfloat16 if getattr(args, "bf16", False) else None,
                checkpoint_dir=ckpt_dir, resume=args.resume, mesh=mesh,
                verbose=not args.quiet,
            )
        else:
            res = sweep_fit(
                configs, splits.x_train, splits.y_train, splits.x_tune, splits.y_tune,
                train_cfg, epochs=args.epochs, verbose=not args.quiet,
                mesh=mesh,
                dtype=jnp.bfloat16 if getattr(args, "bf16", False) else None,
                checkpoint_dir=ckpt_dir,
                resume=args.resume,
            )
    np.save(os.path.join(args.out_dir, "val_losses.npy"), res.val_losses.reshape(grid_shape))

    # per-config inference timing (manual_scan.py:226-248 pred_times): each
    # config extracted from the envelope and timed standalone on one
    # channel's 30 tiles — on the PRODUCTION path (the fused Pallas kernel
    # where the geometry supports it, the Flax model elsewhere), so the
    # reference-parity artifact reflects the framework's real serving speed
    import time as _time

    from specenh.bench.harness import make_production_predict_fn
    from specenh.sweep import extract_config_params

    pred_times = np.zeros_like(res.val_losses)
    if not args.no_time_configs:
        if splits is not None:
            tile_batch = jnp.asarray(splits.x_tune[:30])
        else:
            # streamed grid: one bounded tune chunk, never the full split
            from specenh.config import PatchSpec
            from specenh.train_stream import _iter_chunks

            chunk = next(
                _iter_chunks(store, plan.tune, PatchSpec(), 30), None
            )
            tile_batch = jnp.asarray(chunk[0][:30]) if chunk is not None \
                else None
    if not args.no_time_configs and tile_batch is not None:
        for ci, mc in enumerate(res.configs):
            p_i = extract_config_params(res.stacked_params, ci, mc, res.env)
            f = make_production_predict_fn(mc)
            p_i = f.prepare(p_i)  # pre-scattered handle (serving config)
            np.asarray(f(p_i, tile_batch).ravel()[:1])  # compile+sync
            t0 = _time.perf_counter()
            out = None
            for _ in range(8):
                out = f(p_i, tile_batch)
            np.asarray(out.ravel()[:1])
            pred_times[ci] = (_time.perf_counter() - t0) / 8 / tile_batch.shape[0]
    save_loss_comparisons(
        os.path.join(args.out_dir, "loss_comparisons.npz"),
        res.val_losses, pred_times, grid_shape, names,
    )
    best_cfg = res.configs[res.best_index]
    state = create_state(best_cfg, train_cfg).replace(params=res.best_params)
    save_model(state, os.path.join(args.out_dir, "best_model"), best_cfg)
    plot_val_loss(res.val_history[:, res.best_index], os.path.join(args.out_dir, "best_val_loss.png"))
    store.close()
    print(json.dumps({
        "best_index": res.best_index,
        "best_val_loss": float(res.val_losses[res.best_index]),
        "n_configs": len(configs),
    }))


def cmd_denoise(args):
    import jax.numpy as jnp

    from specenh.io.store import SpectrogramStore
    from specenh.ops.svd import denoise_signal
    from specenh.viz.plots import plot_svd_compare

    os.makedirs(args.out_dir, exist_ok=True)
    with SpectrogramStore(args.dataset, "r") as store:
        shot = store.shots()[0] if args.shot is None else f"ece_{args.shot}"
        d = store.read_channel(shot, args.channel)
    sv = np.asarray(denoise_signal(jnp.asarray(d["spec"], jnp.float32)))
    np.save(os.path.join(args.out_dir, "svd_denoised.npy"), sv)
    plot_svd_compare(
        d["spec"], d["pipeline_out"], sv, shot, args.channel,
        os.path.join(args.out_dir, "svd_compare.png"),
    )
    print(json.dumps({"shot": shot, "channel": args.channel}))


def cmd_crosspower(args):
    """Cross-power spectrogram of two chord signals
    (interferometer/crosspowerspec.py workflow).  Signals from .npy files
    or the site HDF5 layout (--base-dir/--fid-file/--shot)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax.numpy as jnp
    from matplotlib import gridspec

    from specenh.ops.crosspower import ae_co2

    if args.signal1 and args.signal2:
        sig1 = np.load(args.signal1)
        sig2 = np.load(args.signal2)
        t = (
            np.load(args.time)
            if args.time
            else np.arange(len(sig1)) / args.fs
        )
    else:
        from specenh.io.shots import load_time_series_tensor, lookup_fid

        fid = lookup_fid(args.fid_file, int(args.shot))
        # reference quirk kept (crosspowerspec.py:33-34): signal1 comes
        # from the v1v3 pair and signal2 from the v2r0 pair — the cross
        # power is v1 x r0, exactly as the reference computes it
        sig1, _, _ = load_time_series_tensor(args.base_dir, fid, "v1", "v3")
        _, sig2, shots = load_time_series_tensor(args.base_dir, fid, "v2", "r0")
        i = int(np.abs(shots - int(args.shot)).argmin())
        sig1, sig2 = sig1[i], sig2[i]
        import h5py

        with h5py.File(os.path.join(args.base_dir, "tsignal.h5"), "r") as fh:
            t = fh["time"][()]

    ampsp, freq, time_ms = ae_co2(
        jnp.asarray(sig1, jnp.float32), jnp.asarray(sig2, jnp.float32), t,
        nperseg=args.nperseg,
    )
    ampsp = np.asarray(ampsp)
    os.makedirs(args.out_dir, exist_ok=True)
    np.save(os.path.join(args.out_dir, "ampsp.npy"), ampsp)
    fig = plt.figure(figsize=(8, 4), dpi=100)
    gs = gridspec.GridSpec(2, 1)
    ax = plt.subplot(gs[:])
    ax.imshow(np.log(ampsp).T, origin="lower", cmap="hot", aspect="auto",
              extent=[time_ms.min(), time_ms.max(), freq.min(), freq.max()])
    plt.ylabel("Frequency [kHz]")
    plt.xlabel("Time [ms]")
    out = os.path.join(args.out_dir, "crosspower.png")
    fig.savefig(out)
    print(json.dumps({"ampsp": list(ampsp.shape), "plot": out}))


def cmd_import_keras(args):
    """Convert a reference Keras SavedModel/keras file (e.g. the repo's
    missing VAE/best_model artifact) into a specenh orbax model dir."""
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    from tensorflow import keras

    from specenh.models.keras_import import (
        model_config_from_keras_weights,
        params_from_keras_weights,
    )
    from specenh.train import create_state, save_model
    from specenh.config import TrainConfig

    km = keras.models.load_model(args.saved_model, compile=False)
    weights = km.get_weights()
    cfg = model_config_from_keras_weights(weights, input_shape=(256, 128, 1))
    params = params_from_keras_weights(weights, cfg)
    state = create_state(cfg, TrainConfig()).replace(params=params)
    save_model(state, os.path.join(args.out_dir, "model"), cfg)
    print(json.dumps({
        "filters": list(cfg.filters),
        "kernels": [list(k) for k in cfg.kernels],
        "out": os.path.join(args.out_dir, "model"),
    }))


def cmd_bench(args):
    from specenh.bench.headline import main as bench_main

    bench_main(trace_dir=getattr(args, "trace_dir", None))


def cmd_serve(args):
    """Watch a directory of SPEC .bin shots; enhance + persist each."""
    import sys as _sys

    from specenh.serve import EnhanceService, serve_forever

    cfg = _cfg_from_args(args)
    params = None
    model_cfg = MODEL_PRESETS[args.model]
    if args.model_dir:
        from specenh.train import load_model

        state, model_cfg = load_model(args.model_dir)
        params = state.params
    else:
        print(
            "WARNING: no --model-dir given — serving an UNTRAINED "
            f"randomly-initialised '{args.model}' model; outputs are not "
            "meaningful denoisings",
            file=_sys.stderr,
        )
    mesh = None
    if getattr(args, "devices", 0) and args.devices > 1:
        from specenh.parallel.mesh import make_mesh

        mesh = make_mesh(args.devices, ("data",))
    service = EnhanceService(
        cfg, model_cfg, params, n_channels=args.channels, mesh=mesh
    )
    totals = serve_forever(
        service, args.watch_dir, args.out,
        poll_s=args.poll, max_shots=args.max_shots, once=args.once,
        writers=args.writers, verbose=not args.quiet,
    )
    print(json.dumps(totals))


def cmd_movie(args):
    import jax.numpy as jnp

    from specenh.data.tiles import patch, unpatch
    from specenh.io.store import SpectrogramStore
    from specenh.train import load_model, predict
    from specenh.viz.movie import dump_frames, render_movie

    with SpectrogramStore(args.dataset, "r") as store:
        shot = store.shots()[0] if args.shot is None else f"ece_{args.shot}"
        chns = [c for c in range(1, args.channels + 1) if store.has_channel(shot, c)]
        if not chns:
            raise SystemExit(
                f"no channels 1..{args.channels} found in {shot} of {args.dataset}"
            )
        specs = []
        labels = []
        for c in chns:
            d = store.read_channel(shot, c)
            specs.append(d["spec"])
            labels.append(d["pipeline_out"])
        f_ax, t_ax = d["f"], d["t"]
    specs = np.stack(specs)
    labels = np.stack(labels)
    from specenh.config import PatchSpec
    from specenh.data.tiles import n_tiles_for
    # truncate to whole tiles (3840 at the reference geometry) so all three
    # stacks share the prediction width whatever cut_shot built the dataset
    k_t = n_tiles_for(specs.shape[-1], PatchSpec())
    t_keep = k_t * PatchSpec().tile_time
    if args.model:
        state, _ = load_model(args.model)
        tiles = np.asarray(patch(jnp.asarray(specs)))[..., None]
        preds = np.asarray(unpatch(jnp.squeeze(predict(state, jnp.asarray(tiles)), -1),
                                   tiles_per_spec=k_t))
    else:
        preds = labels[:, :, :t_keep]
    # (C, F, T) -> (F, T, C) stacks as graphs.ipynb cell 16 dstacks them
    noisy = specs[:, :, :t_keep].transpose(1, 2, 0)
    proc = labels[:, :, :t_keep].transpose(1, 2, 0)
    pred = preds.transpose(1, 2, 0)
    n = dump_frames(
        noisy, proc, pred, t_ax, f_ax, shot.replace("ece_", ""), args.out_dir,
        start=args.start, stop=args.stop,
    )
    path = render_movie(args.out_dir, shot.replace("ece_", ""), fps=args.fps)
    print(json.dumps({"frames": n, "movie": path}))


# ---------------------------------------------------------------------------


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="specenh", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build-data", help="raw shots -> spectrogram HDF5 dataset")
    b.add_argument("--data-dir", default=None)
    b.add_argument("--out", required=True)
    b.add_argument("--channels", type=int, default=20)
    b.add_argument("--cut-shot", type=float, default=None)
    b.add_argument("--binary", action="store_true",
                   help="stream SPEC .bin shots via the native prefetcher")
    b.add_argument("--writers", type=int, default=1,
                   help="parallel HDF5 writer threads/files on the streaming "
                        "(--binary) path; readers see one union store")
    b.add_argument("--quiet", action="store_true")
    b.set_defaults(fn=cmd_build_data)

    ms = sub.add_parser(
        "merge-shards",
        help="fold a writer-pool store (base + .shardK) into one HDF5 file",
    )
    ms.add_argument("--store", required=True, help="base store path")
    ms.add_argument("--out", default=None,
                    help="write the merged copy here instead of "
                         "consolidating in place")
    ms.add_argument("--keep-shards", action="store_true",
                    help="leave absorbed sidecars on disk (in-place mode)")
    ms.set_defaults(fn=cmd_merge_shards)

    cb = sub.add_parser("convert-bin", help="pickle shots -> SPEC binaries")
    cb.add_argument("--data-dir", required=True)
    cb.add_argument("--out-dir", required=True)
    cb.add_argument("--channels", type=int, default=20)
    cb.set_defaults(fn=cmd_convert_bin)

    s = sub.add_parser("synth-shots", help="generate synthetic raw shots")
    s.add_argument("--out", required=True)
    s.add_argument("--shots", type=int, default=3)
    s.add_argument("--channels", type=int, default=20)
    s.add_argument("--samples", type=int, default=1_000_000)
    s.add_argument("--seed", type=int, default=0)
    s.set_defaults(fn=cmd_synth_shots)

    t = sub.add_parser("train", help="train one autoencoder config")
    t.add_argument("--dataset", required=True)
    t.add_argument("--out-dir", required=True)
    t.add_argument("--model", choices=sorted(MODEL_PRESETS), default="scan_k3")
    t.add_argument("--epochs", type=int, default=15)
    t.add_argument("--num-shots", type=int, default=20)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--split-by", choices=["tile", "shot"], default="tile",
                   help="'tile' = reference-exact leaky split "
                        "(hyperparam_scan.py:148-149); 'shot' = leak-free "
                        "shot-level split (dataset.ipynb cell 3) — honored "
                        "by the resident, streamed, and --devices paths")
    t.add_argument("--batch-size", type=int, default=128,
                   help="training batch size (reference recipe: 128; the "
                        "fused kernel engine amortizes fixed per-step cost "
                        "with bigger batches)")
    t.add_argument("--lr", type=float, default=1e-3,
                   help="Adam learning rate (reference/Keras default 1e-3)")
    t.add_argument("--chunk-tiles", type=int, default=None,
                   help="tiles per streamed chunk (default 4096 ~ 1.1 GB "
                        "of device residency); streamed path only")
    t.add_argument("--chunk-dtype", choices=["f32", "bf16"], default=None,
                   help="streamed chunk storage/upload dtype: bf16 halves "
                        "cache RAM and per-epoch host->device bytes, and is "
                        "VALUE-EXACT with --engine kernel (the kernel casts "
                        "its tile operands to bf16 anyway); ~1e-3 input "
                        "quantization on the f32/bf16 engines")
    t.add_argument("--tile-cache", default=None, metavar="BASE",
                   help="persist the canonical tile stream pre-tiled on "
                        "disk (<BASE>.<split>.tiles, fingerprinted against "
                        "the exact slice plan): later runs over the same "
                        "dataset memmap contiguous chunk slabs instead of "
                        "re-reading + re-tiling HDF5")
    t.add_argument("--stream-cache", choices=["auto", "always", "never"],
                   default="auto",
                   help="host-RAM chunk cache for the streamed epoch: "
                        "epochs after the first stream from memory instead "
                        "of re-reading the store (~31 GB/epoch at reference "
                        "scale).  auto = bounded by SPECENH_STREAM_CACHE_GB "
                        "(default 60%% of MemAvailable)")
    t.add_argument("--patience", type=int, default=None,
                   help="early-stop after N epochs without val_loss "
                        "improvement (the reference's commented-out "
                        "EarlyStopping(patience=15); default: off)")
    t.add_argument("--bench-shot", default="176053")
    t.add_argument("--trace-dir", default=None,
                   help="write an xprof/TensorBoard device trace of training")
    t.add_argument("--stream", choices=["auto", "always", "never"], default="auto",
                   help="host-stream the epoch when the tile tensors exceed "
                        "HBM (auto sizes from store metadata; budget via "
                        "SPECENH_HBM_BUDGET_GB, default 12)")
    t.add_argument("--devices", type=int, default=0,
                   help="train data-parallel over N devices (dp_fit on a "
                        "'data' mesh; dataset sharded across chips)")
    t.add_argument("--bf16", action="store_true",
                   help="bfloat16 activations (params/optimizer stay f32): "
                        "measured 1.5x epoch time, loss-trajectory parity "
                        "verified vs f32 on the reference recipe")
    t.add_argument("--engine", choices=["f32", "bf16", "kernel"], default=None,
                   help="training engine: f32 (reference-parity default), "
                        "bf16 (1.6x), kernel (fused Pallas fwd+bwd — "
                        "activations never leave VMEM; resident, streamed, "
                        "or sharded over --devices with gradient psum)")
    t.add_argument("--checkpoints", action="store_true")
    t.add_argument("--resume", action="store_true",
                   help="continue from the latest epoch checkpoint")
    t.add_argument("--quiet", action="store_true")
    t.set_defaults(fn=cmd_train)

    tr = sub.add_parser("train-raw", help="raw shots -> model, device-resident (no HDF5)")
    tr.add_argument("--data-dir", required=True)
    tr.add_argument("--out-dir", required=True)
    tr.add_argument("--model", choices=sorted(MODEL_PRESETS), default="scan_k3")
    tr.add_argument("--channels", type=int, default=20)
    tr.add_argument("--epochs", type=int, default=15)
    tr.add_argument("--seed", type=int, default=0)
    tr.add_argument("--cut-shot", type=float, default=None)
    tr.add_argument("--split-by", choices=["tile", "shot"], default="tile",
                    help="'tile' = reference-exact leaky split; 'shot' = leak-free")
    tr.add_argument("--batch-size", type=int, default=128)
    tr.add_argument("--lr", type=float, default=1e-3)
    tr.add_argument("--patience", type=int, default=None,
                    help="early-stop after N stale val epochs (default off)")
    tr.add_argument("--binary", action="store_true")
    tr.add_argument("--engine", choices=["f32", "bf16", "kernel"], default=None,
                    help="training engine (same semantics as `train`)")
    tr.add_argument("--devices", type=int, default=0,
                    help="run the whole campaign SPMD over N devices: the "
                         "trace upload lands channel-sharded, the STFT/"
                         "pipeline/tiling compute on the shards, training "
                         "is data-parallel")
    tr.add_argument("--quiet", action="store_true")
    tr.set_defaults(fn=cmd_train_raw)

    w = sub.add_parser("sweep", help="vmapped hyperparameter sweep")
    w.add_argument("--dataset", required=True)
    w.add_argument("--out-dir", required=True)
    w.add_argument("--grid", choices=["kernel", "2layer", "3layer"], default="kernel")
    w.add_argument("--kernel-vals", default=None, metavar="K,K,...",
                   help="kernel-grid square kernel sizes "
                        "(hyperparam_scan.py:123; default 3,5,7)")
    w.add_argument("--ker", default=None, metavar="K,...",
                   help="3layer grid kernel sizes "
                        "(manual_scan_3layers.py:119; default 5)")
    w.add_argument("--ker1", default=None, metavar="K,...",
                   help="2layer grid axis (manual_scan.py:120; default 5)")
    w.add_argument("--ker2", default=None, metavar="K,...")
    w.add_argument("--ker3", default=None, metavar="K,...")
    w.add_argument("--conv1", default=None, metavar="C,...",
                   help="filter-count axis (2layer default 64; 3layer 16)")
    w.add_argument("--conv2", default=None, metavar="C,...",
                   help="filter-count axis (default 32)")
    w.add_argument("--conv3", default=None, metavar="C,...",
                   help="3layer filter-count axis "
                        "(manual_scan_3layers.py:122; default 64)")
    w.add_argument("--epochs", type=int, default=15)
    w.add_argument("--num-shots", type=int, default=20)
    w.add_argument("--seed", type=int, default=0)
    w.add_argument("--split-by", choices=["tile", "shot"], default="tile",
                   help="'tile' = reference-exact leaky split; 'shot' = leak-free")
    w.add_argument("--batch-size", type=int, default=128)
    w.add_argument("--lr", type=float, default=1e-3)
    w.add_argument("--patience", type=int, default=None,
                   help="early-stop a config (serial engine) / the grid "
                        "(envelope: when every config is stale) after N "
                        "epochs without val improvement (default off)")
    w.add_argument("--devices", type=int, default=0,
                   help="envelope engine: shard the CONFIG axis over N "
                        "devices (the SLURM-array analog on a 'sweep' "
                        "mesh); kernel engine: train each config "
                        "DATA-parallel over N devices")
    w.add_argument("--bf16", action="store_true",
                   help="bfloat16-activation sweep training (1.5x epochs)")
    w.add_argument("--engine", choices=["envelope", "kernel"],
                   default="envelope",
                   help="envelope: all configs vmapped at the largest "
                        "geometry's cost; kernel: serial per-config fits "
                        "on the fused Pallas training kernels (measured "
                        "3.3x on the k3/k5/k7 grid)")
    w.add_argument("--stream", choices=["auto", "always", "never"],
                   default="auto",
                   help="host-stream each config's epochs when the tile "
                        "tensors exceed the HBM budget (serial --engine "
                        "kernel only; the 200-shot recipe's grid cannot "
                        "assemble resident).  Same budget env as train.")
    w.add_argument("--chunk-tiles", type=int, default=None,
                   help="tiles per streamed chunk (streamed sweeps only)")
    w.add_argument("--chunk-dtype", choices=["f32", "bf16"], default=None,
                   help="streamed chunk dtype (see train --chunk-dtype)")
    w.add_argument("--tile-cache", default=None, metavar="BASE",
                   help="pre-tiled on-disk tile cache: configs 2..N skip "
                        "the HDF5 pass entirely (see train --tile-cache)")
    w.add_argument("--no-time-configs", action="store_true",
                   help="skip the per-config pred_times measurement")
    w.add_argument("--checkpoints", action="store_true",
                   help="snapshot the stacked sweep state every epoch")
    w.add_argument("--resume", action="store_true",
                   help="continue the grid from the latest epoch checkpoint")
    w.add_argument("--quiet", action="store_true")
    w.set_defaults(fn=cmd_sweep)

    d = sub.add_parser("denoise", help="SVD denoise one channel")
    d.add_argument("--dataset", required=True)
    d.add_argument("--out-dir", required=True)
    d.add_argument("--shot", default=None)
    d.add_argument("--channel", type=int, default=1)
    d.set_defaults(fn=cmd_denoise)

    cp = sub.add_parser("crosspower", help="two-chord cross-power spectrogram")
    cp.add_argument("--signal1", default=None, help=".npy chord signal 1")
    cp.add_argument("--signal2", default=None, help=".npy chord signal 2")
    cp.add_argument("--time", default=None, help=".npy time base (seconds)")
    cp.add_argument("--fs", type=float, default=1.667e6)
    cp.add_argument("--base-dir", default=None, help="site HDF5 layout root")
    cp.add_argument("--fid-file", default=None)
    cp.add_argument("--shot", default=None)
    cp.add_argument("--nperseg", type=int, default=1024)
    cp.add_argument("--out-dir", required=True)
    cp.set_defaults(fn=cmd_crosspower)

    ik = sub.add_parser("import-keras", help="reference Keras model -> specenh model dir")
    ik.add_argument("--saved-model", required=True)
    ik.add_argument("--out-dir", required=True)
    ik.set_defaults(fn=cmd_import_keras)

    be = sub.add_parser("bench", help="spectrograms/sec/chip benchmark")
    be.add_argument("--trace-dir", default=None,
                    help="write an xprof/TensorBoard device trace of the "
                         "measured region")
    be.set_defaults(fn=cmd_bench)

    sv = sub.add_parser("serve", help="watch-dir enhancement service")
    sv.add_argument("--watch-dir", required=True)
    sv.add_argument("--out", required=True)
    sv.add_argument("--model", choices=sorted(MODEL_PRESETS), default="scan_k3")
    sv.add_argument("--model-dir", default=None,
                    help="trained model dir (overrides --model preset)")
    sv.add_argument("--channels", type=int, default=20)
    sv.add_argument("--devices", type=int, default=0,
                    help="shard channels over N devices (data mesh)")
    sv.add_argument("--cut-shot", type=float, default=None)
    sv.add_argument("--poll", type=float, default=1.0)
    sv.add_argument("--max-shots", type=int, default=None)
    sv.add_argument("--once", action="store_true",
                    help="drain the current backlog and exit")
    sv.add_argument("--writers", type=int, default=1,
                    help="parallel HDF5 writer threads/files (persist is "
                         "the measured serving bottleneck; readers see one "
                         "union store)")
    sv.add_argument("--quiet", action="store_true")
    sv.set_defaults(fn=cmd_serve)

    m = sub.add_parser("movie", help="frame dump + mp4 render")
    m.add_argument("--dataset", required=True)
    m.add_argument("--out-dir", required=True)
    m.add_argument("--shot", default=None)
    m.add_argument("--model", default=None)
    m.add_argument("--channels", type=int, default=20)
    m.add_argument("--start", type=int, default=0)
    m.add_argument("--stop", type=int, default=None)
    m.add_argument("--fps", type=int, default=30)
    m.set_defaults(fn=cmd_movie)

    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    try:
        args.fn(args)
    except FileNotFoundError as e:
        raise SystemExit(f"specenh {args.cmd}: file not found: {e}") from e
    except OSError as e:
        # h5py raises OSError for missing/corrupt dataset files
        raise SystemExit(f"specenh {args.cmd}: {e}") from e


if __name__ == "__main__":
    main()
