"""Experiment driver (reference `/root/reference/src/utils/quick_start.py`).

Merges configs, builds the dataset/device buffers once, then runs an
exhaustive grid search over the cartesian product of the list-valued
``hyper_parameters`` axes (`quick_start.py:54-95`) — re-seeding and
rebuilding the model per combination and tracking best-valid /
test-at-best-valid across combinations.
"""

from __future__ import annotations

import itertools
from logging import getLogger
from typing import Any, Dict, Optional, Tuple

from recommendar_systems_tpu.data.arrays import build_data_bundle
from recommendar_systems_tpu.data.dataset import load_dataset
from recommendar_systems_tpu.models import get_model
from recommendar_systems_tpu.train.trainer import Trainer
from recommendar_systems_tpu.utils.configurator import Config
from recommendar_systems_tpu.utils.logger import init_logger
from recommendar_systems_tpu.utils.misc import dict2str, init_seed


def quick_start(
    model: str,
    dataset: str,
    config_dict: Optional[Dict[str, Any]] = None,
    save_model: bool = True,
    mg: bool = False,
) -> Dict[str, Any]:
    config = Config(model, dataset, config_dict, mg=mg)
    init_logger(config)
    logger = getLogger()
    logger.info(f"███████████ TPU engine \t███████████████")

    # device selection (counterpart of reference configurator.py:114-118):
    # config['device'] = 'cpu' forces the host platform (the axon TPU plugin
    # ignores JAX_PLATFORMS, so use the config flag)
    # multi-host runtime: must initialize BEFORE the first backend query so
    # jax.devices() spans every process' chips (parallel/multihost.py;
    # --config multihost=true coordinator_address=... num_processes=N
    # process_id=R, or the standard JAX env vars / pod auto-detection)
    from recommendar_systems_tpu.parallel.multihost import initialize_from_config

    if initialize_from_config(config):
        import jax

        logger.info(
            f"multihost: process {jax.process_index()}/{jax.process_count()}, "
            f"{len(jax.local_devices())} local / {len(jax.devices())} global devices"
        )

    if config.get("device") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        # persistent XLA compile cache: big fused programs compile in
        # minutes cold over the axon tunnel but load warm in <1 s
        # (utils/compile_cache.py; compile_cache=false disables)
        cc = config.get("compile_cache")
        if cc is None or bool(cc):
            from recommendar_systems_tpu.utils.compile_cache import (
                enable_compile_cache,
            )

            enable_compile_cache()

    # graph densification budget (see graph/sparse.py): adjacencies whose
    # dense f32 storage fits under this many MB propagate via MXU matmuls
    if config.get("dense_graph_mb") is not None:
        from recommendar_systems_tpu.graph.sparse import set_dense_threshold

        set_dense_threshold(int(float(config["dense_graph_mb"]) * 2**20))
    if str(config.get("dense_graph_dtype") or "float32") == "bfloat16":
        import jax.numpy as jnp

        from recommendar_systems_tpu.graph.sparse import set_dense_dtype

        set_dense_dtype(jnp.bfloat16)

    # fused one-pass bidirectional propagation kernel (ops/fused_bip.py):
    # pad dense symmetric blocks at build time.  Under a mesh the padded
    # blocks row-shard like the raw node counts (parallel/mesh.py
    # collect_table_dims) and the Pallas path wraps itself in shard_map.
    fused = config.get("fused_bip")
    fused = True if fused is None else bool(fused)
    from recommendar_systems_tpu.graph.sparse import set_fused_bip

    set_fused_bip(fused)

    # bit-packed 0/1 adjacency storage (ops/bitbip.py): true / false / auto
    # (auto = TPU only; the CPU path would run Pallas in interpret mode)
    if config.get("bit_adj") is not None:
        from recommendar_systems_tpu.graph.sparse import set_bit_adj

        v = config["bit_adj"]
        set_bit_adj(v if v == "auto" else bool(v))
    # optional density gate for "auto": slot-proportional bit matmuls can
    # lose to edge-proportional COO on very sparse catalogs (PARITY.md
    # SMORE-at-elec trace); 0/unset keeps the ungated default
    if config.get("bit_density_floor"):
        from recommendar_systems_tpu.graph.sparse import set_bit_density_floor

        set_bit_density_floor(float(config["bit_density_floor"]))

    # u-i propagation kernel on factored int8 storage: "xla" (default;
    # measured faster on v5e) or "pallas" (ops/fused_bip.py)
    if config.get("ui_matmul_mode"):
        from recommendar_systems_tpu.graph.sparse import set_ui_matmul_mode

        set_ui_matmul_mode(str(config["ui_matmul_mode"]))

    # fused masked-softmax attention kernel (ops/masked_attn.py): GRCN's
    # dense routing pads its mask at build time when on; under a mesh the
    # kernel row-shards itself (masked_attention_auto)
    fattn = config.get("fused_attn")
    fattn = True if fattn is None else bool(fattn)
    from recommendar_systems_tpu.ops.masked_attn import set_fused_attn

    set_fused_attn(fattn)

    # synthetic datasets are generated on first use (the reference ships no
    # data at all; see data/README.md there)
    if config.get("synthetic"):
        import os

        from recommendar_systems_tpu.data.synthetic import (
            generate_synthetic,
            write_dataset_files,
        )

        ds_dir = os.path.join(config["data_path"], dataset)
        inter = os.path.join(ds_dir, config["inter_file_name"] or f"{dataset}.inter")
        if not os.path.isfile(inter):
            logger.info(f"generating synthetic dataset at {ds_dir}")
            gen = generate_synthetic(
                n_users=int(config.get("synthetic_users", 400)),
                n_items=int(config.get("synthetic_items", 200)),
                n_inter=int(config.get("synthetic_inters", 6000)),
                seed=int(config.get("synthetic_seed", 0)),
                name=dataset,
            )
            write_dataset_files(gen, ds_dir)

    # dataset: built once for all hyperparameter combinations
    ds = load_dataset(config)
    logger.info(str(ds))
    data = build_data_bundle(ds, config)

    # hyperparameter grid
    axes = config["hyper_parameters"]
    grids = []
    for ax in axes:
        v = config[ax]
        grids.append(v if isinstance(v, list) else [v])
    combinations = list(itertools.product(*grids))
    total = len(combinations)
    logger.info(f"\n\n=================================\n\n")

    model_cls = get_model(model)
    best_idx = -1
    best_trainer = None
    best_valid_score = None
    best_valid_result = best_test_upon_valid = None
    results = []
    for idx, combo in enumerate(combinations):
        run_cfg = config.copy()
        for ax, val in zip(axes, combo):
            run_cfg[ax] = val
        seed = int(run_cfg["seed"])
        init_seed(seed)
        logger.info(
            f"========={idx + 1}/{total}: Parameters:{axes}={list(combo)}======="
        )

        if config.get("export_dir"):
            # serving export wants the best-valid state, not end-of-training
            run_cfg["keep_best_state"] = True
        m = model_cls.from_config(run_cfg, data)
        ctx = model_cls.build_ctx(run_cfg, data)
        trainer = Trainer(run_cfg, m, ctx, data, mg=mg)
        trainer.init_state(seed)
        valid_score, valid_result, test_result = trainer.fit(saved=save_model)
        results.append((list(combo), valid_score, valid_result, test_result))
        logger.info(f"best valid result: {dict2str(valid_result)}")
        logger.info(f"test result: {dict2str(test_result)}")

        bigger = bool(config["valid_metric_bigger"])
        if best_valid_score is None or (
            valid_score > best_valid_score if bigger else valid_score < best_valid_score
        ):
            best_valid_score = valid_score
            best_valid_result = valid_result
            best_test_upon_valid = test_result
            best_idx = idx
            best_trainer = trainer

    logger.info("\n============All Over=====================")
    for combo, vs, vr, tr in results:
        logger.info(
            f"Parameters: {axes}={combo},\n"
            f"best valid: {dict2str(vr)},\nbest test: {dict2str(tr)}\n\n"
        )
    logger.info("\n\n█████████████ BEST ████████████████")
    logger.info(
        f"\tParameters: {axes}={results[best_idx][0]},"
        f"\nValid: {dict2str(best_valid_result)},\nTest: {dict2str(best_test_upon_valid)}\n\n"
    )
    if config.get("export_dir"):
        from recommendar_systems_tpu.serve import export_artifact

        export_artifact(
            best_trainer, str(config["export_dir"]),
            quantize_int8=bool(config.get("export_int8") or False),
        )
        logger.info(f"serving artifact (best combo) exported to {config['export_dir']}")
    return {
        "best_valid_score": best_valid_score,
        "best_valid_result": best_valid_result,
        "best_test_upon_valid": best_test_upon_valid,
        "all_results": results,
    }
