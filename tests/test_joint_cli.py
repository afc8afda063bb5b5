"""Joint-pretraining CLI over real fixture datasets + downstream warm-start."""

import json

import numpy as np

from tests.fixtures import (
    load_script,
    write_pastis_fixture,
    write_treesat_fixture,
)


def test_joint_pretrain_cli_and_warm_start(tmp_path, capsys):
    root_a = tmp_path / "treesat"
    root_b = tmp_path / "pastis"
    write_treesat_fixture(root_a, num_tiles=2)
    write_pastis_fixture(root_b, num_tiles=1)

    cli = load_script("joint_pretrain")
    out = tmp_path / "joint"
    cli.main([
        str(out),
        f"--datasets=treesatai_ts:{root_a},pastis_hd:{root_b}",
        "datasets.treesatai_ts.rel_dir=", "datasets.pastis_hd.rel_dir=",
        "datasets.treesatai_ts.aerial.image_size=40",
        "datasets.treesatai_ts.aerial.patch_size.mae=8",
        "datasets.pastis_hd.spot.image_size=32",
        "datasets.pastis_hd.spot.patch_size.mae=4",
        "model.model_size=micro", "model.fusion_mode=group",
        "model.inter_depth=1",
        "opt_pretrain.epochs=1", "opt_pretrain.batch_size=1",
        "trainer.compute_dtype=float32", "data.num_workers=1",
        "trainer.mesh_data=2",  # exercise the sharded joint path (dp2)
    ])
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    head, epochs = lines[0], lines[1:]
    assert head["shared_param_leaves"] > 0  # s2/s1 embedders + encoders/trunk
    assert set(head["datasets"]) == {"treesatai_ts", "pastis_hd"}
    assert epochs, "no epoch logs"
    for e in epochs:
        assert np.isfinite(e["loss_rec/treesatai_ts"])
        assert np.isfinite(e["loss_rec/pastis_hd"])

    from maestro_tpu.train.checkpoint import find_latest_checkpoint

    path = find_latest_checkpoint(out / "checkpoints", "pretrain")
    assert path is not None

    # --resume restores the full state and continues at the next epoch
    cli.main([
        str(out),
        f"--datasets=treesatai_ts:{root_a},pastis_hd:{root_b}",
        "datasets.treesatai_ts.rel_dir=", "datasets.pastis_hd.rel_dir=",
        "datasets.treesatai_ts.aerial.image_size=40",
        "datasets.treesatai_ts.aerial.patch_size.mae=8",
        "datasets.pastis_hd.spot.image_size=32",
        "datasets.pastis_hd.spot.patch_size.mae=4",
        "model.model_size=micro", "model.fusion_mode=group",
        "model.inter_depth=1",
        "opt_pretrain.epochs=2", "opt_pretrain.batch_size=1",
        "trainer.compute_dtype=float32", "data.num_workers=1",
        "trainer.mesh_data=2", "--resume",
    ])
    lines2 = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert lines2[0]["start_epoch"] == 1
    resumed_epochs = [l for l in lines2 if "epoch" in l]
    assert [e["epoch"] for e in resumed_epochs] == [1]
    path2 = find_latest_checkpoint(out / "checkpoints", "pretrain")
    assert "epoch=1" in str(path2)

    # the joint checkpoint warm-starts a per-dataset probe (strict=False
    # merge drops the other dataset's modules, exactly like the reference's
    # sequential transfer)
    from maestro_tpu.conf import (
        DataConfig,
        DatasetsConfig,
        ExperimentConfig,
        MaskConfig,
        ModelConfig,
        OptFinetuneConfig,
        OptPretrainConfig,
        OptProbeConfig,
        RunConfig,
        TrainerConfig,
    )
    from maestro_tpu.train.runtime import run_experiment

    datasets = DatasetsConfig(root_dir=str(root_a),
                              name_dataset="treesatai_ts")
    datasets.treesatai_ts.rel_dir = ""
    datasets.treesatai_ts.aerial.image_size = 40
    datasets.treesatai_ts.aerial.patch_size.mae = 8
    datasets.treesatai_ts.__post_init__()
    cfg = ExperimentConfig(
        run=RunConfig(exp_dir=str(tmp_path), exp_name="from_joint", seed=0,
                      load_ckpt_path=str(path), logged_images_per_epoch=0),
        opt_pretrain=OptPretrainConfig(epochs=0),
        opt_probe=OptProbeConfig(epochs=1, batch_size=2),
        opt_finetune=OptFinetuneConfig(epochs=0),
        data=DataConfig(num_workers=1),
        mask=MaskConfig(),
        model=ModelConfig(model_size="micro", fusion_mode="group",
                          inter_depth=1),
        trainer=TrainerConfig(mesh_data=1, compute_dtype="float32"),
    )
    results = run_experiment(cfg, datasets, tmp_path / "probe_work")
    assert "treesat_mlc_thresh/weighted_f1" in results["probe"].val_metrics
