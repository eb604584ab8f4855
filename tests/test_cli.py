"""CLI smoke tests: run each front-end in-process on tiny random-init
configs (the reference flag surface, --mtype/--img_size/--start_features)."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


TINY = ["--img_size", "16", "--start_features", "128", "--random_init"]


@pytest.mark.heavy
def test_e_align_cli_case1(tmp_path):
    from tpugan.cli.e_align import main

    exp = str(tmp_path / "exp")
    main(
        ["--mtype", "1", *TINY, "--iterations", "2", "--batch_size", "2",
         "--log_every", "1", "--experiment_dir", exp]
    )
    assert os.path.exists(os.path.join(exp, "Loss.txt"))
    lines = open(os.path.join(exp, "Loss.txt")).read().strip().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert np.isfinite(rec["loss_mtv"]) and np.isfinite(rec["loss_tsa"])
    assert any(f.endswith(".jpg") for f in os.listdir(os.path.join(exp, "imgs")))


def test_e_align_cli_case2_pggan(tmp_path):
    from tpugan.cli.e_align import main

    exp = str(tmp_path / "exp3")
    main(
        ["--mtype", "3", *TINY, "--iterations", "1", "--batch_size", "2",
         "--log_every", "1", "--experiment_dir", exp]
    )
    assert os.path.exists(os.path.join(exp, "Loss.txt"))


@pytest.mark.heavy
def test_embedding_cli_optimize_w(tmp_path):
    from tpugan.cli.embedding import main
    from tpugan.io.image import save_image

    img_dir = str(tmp_path / "imgs_in")
    os.makedirs(img_dir)
    rngs = np.random.RandomState(0)
    for i in range(2):
        save_image(os.path.join(img_dir, f"{i}.png"), rngs.rand(16, 16, 3).astype(np.float32))

    exp = str(tmp_path / "exp_embed")
    main(
        ["--mtype", "1", *TINY, "--iterations", "4", "--batch_size", "1",
         "--img_dir", img_dir, "--optimizeE", "false", "--experiment_dir", exp]
    )
    models = os.path.join(exp, "models")
    assert os.path.exists(os.path.join(models, "w_all.npy"))
    w_all = np.load(os.path.join(models, "w_all.npy"))
    assert w_all.shape == (2, 6, 512)


@pytest.mark.heavy
def test_embedding_cli_finetune_e_bf16(tmp_path):
    """--optimizeE true --bf16: fine-tune-E with bf16 encoder compute
    (bf16_encode_images wiring in cli/embedding.py) runs end-to-end and
    emits fp32 w codes."""
    from tpugan.cli.embedding import main
    from tpugan.io.image import save_image

    img_dir = str(tmp_path / "imgs_in")
    os.makedirs(img_dir)
    rngs = np.random.RandomState(0)
    save_image(os.path.join(img_dir, "0.png"), rngs.rand(16, 16, 3).astype(np.float32))

    exp = str(tmp_path / "exp_embed_e")
    main(
        ["--mtype", "1", *TINY, "--iterations", "4", "--batch_size", "1",
         "--img_dir", img_dir, "--optimizeE", "true", "--bf16",
         "--experiment_dir", exp]
    )
    w_all = np.load(os.path.join(exp, "models", "w_all.npy"))
    assert w_all.shape == (1, 6, 512)
    assert w_all.dtype == np.float32
    assert np.all(np.isfinite(w_all))


@pytest.mark.heavy
def test_export_model_cli(tmp_path):
    """Serving-artifact export: the CLI writes a StableHLO blob and its
    --check pass reloads it and matches the live jitted function."""
    from tpugan.cli.export_model import main

    out = str(tmp_path / "g.stablehlo")
    main(["--mtype", "1", *TINY, "--batch_size", "2", "--out", out, "--check"])
    assert os.path.getsize(out) > 0

    out_e = str(tmp_path / "e.stablehlo")
    main(["--mtype", "1", *TINY, "--batch_size", "2", "--what", "encode",
          "--out", out_e, "--check"])
    assert os.path.getsize(out_e) > 0


def test_edit_cli(tmp_path):
    from tpugan.cli.edit import main

    w = np.random.RandomState(0).randn(1, 6, 512).astype(np.float32)
    d = np.random.RandomState(1).randn(1, 512).astype(np.float32)
    w_path = str(tmp_path / "w.npy")
    d_path = str(tmp_path / "d.npy")
    np.save(w_path, w)
    np.save(d_path, d)
    out = str(tmp_path / "edited.png")
    main(
        ["--mtype", "1", *TINY, "--w_path", w_path, "--direction", d_path,
         "--bonus", "2.0", "--start", "0", "--end", "6", "--out", out]
    )
    assert os.path.exists(out)


def test_compare_cli(tmp_path, capsys):
    from tpugan.cli.compare import main
    from tpugan.io.image import save_image

    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    rngs = np.random.RandomState(0)
    img = rngs.rand(16, 16, 3).astype(np.float32)
    save_image(os.path.join(d1, "x.png"), img)
    save_image(os.path.join(d2, "x.png"), img)
    main(["--dir1", d1, "--dir2", d2, "--img_size", "16"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    result = json.loads(out)
    assert result["ssim"] > 0.999 and result["mse"] < 1e-4


def test_rec_real_img_cli(tmp_path):
    from tpugan.cli.rec_real_img import main
    from tpugan.io.image import save_image

    img_dir = str(tmp_path / "real")
    os.makedirs(img_dir)
    save_image(os.path.join(img_dir, "0.png"), np.random.rand(16, 16, 3).astype(np.float32))
    exp = str(tmp_path / "exp_rec")
    main(["--mtype", "1", *TINY, "--img_dir", img_dir, "--experiment_dir", exp])
    files = os.listdir(os.path.join(exp, "imgs"))
    assert "00000_real.png" in files and "00000_rec.png" in files


def test_synthesize_cli(tmp_path):
    from tpugan.cli.synthesize import main

    exp = str(tmp_path / "exp_syn")
    main(
        ["--mtype", "1", *TINY, "--batch_size", "2", "--count", "2",
         "--experiment_dir", exp]
    )
    files = os.listdir(os.path.join(exp, "imgs"))
    assert "seed30000.png" in files and "seed30001.png" in files


@pytest.mark.heavy
def test_e_align_cli_ablation_z(tmp_path):
    """Ablation step 1: z-only encoder with Gm re-mapping."""
    from tpugan.cli.e_align import main

    exp = str(tmp_path / "exp_ab1")
    main(
        ["--mtype", "1", *TINY, "--ablation", "1", "--iterations", "2",
         "--batch_size", "2", "--log_every", "1", "--experiment_dir", exp]
    )
    lines = open(os.path.join(exp, "Loss.txt")).read().strip().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[-1])
    assert np.isfinite(rec["loss_c_mse"])  # the z loss drives this ablation


@pytest.mark.heavy
def test_e_align_cli_ablation_8(tmp_path):
    from tpugan.cli.e_align import main

    exp = str(tmp_path / "exp_ab8")
    main(
        ["--mtype", "1", *TINY, "--ablation", "8", "--iterations", "1",
         "--batch_size", "2", "--log_every", "1", "--experiment_dir", exp]
    )
    assert os.path.exists(os.path.join(exp, "Loss.txt"))


def test_baseline_i2s_cli(tmp_path):
    from tpugan.cli.baseline_i2s import main
    from tpugan.io.image import save_image

    img_dir = str(tmp_path / "real_i2s")
    os.makedirs(img_dir)
    save_image(os.path.join(img_dir, "0.png"), np.random.rand(16, 16, 3).astype(np.float32))
    exp = str(tmp_path / "exp_i2s")
    main(["--mtype", "1", *TINY, "--img_dir", img_dir, "--iterations", "100",
          "--experiment_dir", exp])
    assert os.path.exists(os.path.join(exp, "imgs", "00000_rec.png"))
    w = np.load(os.path.join(exp, "models", "00000_w.npy"))
    assert w.shape == (6, 512)


def test_cached_path_local(tmp_path):
    from tpugan.io.fetch import cached_path

    p = tmp_path / "x.bin"
    p.write_bytes(b"abc")
    assert cached_path(str(p)) == str(p)
    try:
        cached_path(str(tmp_path / "missing.bin"))
        assert False
    except FileNotFoundError:
        pass


@pytest.mark.heavy
def test_e_align_cli_stylegan2(tmp_path):
    from tpugan.cli.e_align import main

    exp = str(tmp_path / "exp_sg2")
    main(
        ["--mtype", "2", "--img_size", "16", "--random_init", "--iterations", "1",
         "--batch_size", "2", "--log_every", "1", "--experiment_dir", exp,
         "--start_features", "128"]
    )
    assert os.path.exists(os.path.join(exp, "Loss.txt"))


@pytest.mark.heavy
def test_e_align_cli_biggan(tmp_path):
    from tpugan.cli.e_align import main
    from tpugan.models import BigGANConfig

    # tiny BigGAN config via --config_dir (the reference's own mechanism)
    cfg = BigGANConfig(
        output_dim=16, z_dim=8, class_embed_dim=8, channel_width=4,
        num_classes=10,
        layers=[(False, 16, 16), (True, 16, 8), (False, 8, 4), (True, 4, 2), (False, 2, 1)],
        attention_layer_position=1,
    )
    cfg_path = str(tmp_path / "biggan.json")
    open(cfg_path, "w").write(cfg.to_json_string())

    exp = str(tmp_path / "exp_big")
    main(
        ["--mtype", "4", "--img_size", "16", "--z_dim", "8", "--random_init",
         "--iterations", "1", "--batch_size", "2", "--log_every", "1",
         "--experiment_dir", exp, "--start_features", "128",
         "--config_dir", cfg_path]
    )
    assert os.path.exists(os.path.join(exp, "Loss.txt"))


@pytest.mark.heavy
def test_e_mis_align_cli(tmp_path):
    from tpugan.cli.e_mis_align import main

    exp = str(tmp_path / "exp_mis")
    main(
        ["--mtype", "1", "--img_size", "16", "--start_features", "128",
         "--random_init", "--iterations", "1", "--batch_size", "2",
         "--log_every", "1", "--experiment_dir", exp]
    )
    lines = open(os.path.join(exp, "Loss.txt")).read().strip().splitlines()
    rec = json.loads(lines[-1])
    assert np.isfinite(rec["loss_mask_mse"]) and np.isfinite(rec["loss_gcam_mse"])
    # guided-backprop gradient loss group, logged like the reference
    # (E_mis_align_cropping_s1.py:161-172)
    assert np.isfinite(rec["loss_grad_mse"]) and np.isfinite(rec["loss_grad_cosine"])
    # heatmap/CAM/gb dumps every log_every iters (:276-288)
    cam_dir = os.path.join(exp, "grad_cam")
    assert {"heatmap_0.png", "cam_0.png", "gb_0.png"} <= set(os.listdir(cam_dir))
    assert any(f.startswith("ep0_iter0") for f in os.listdir(os.path.join(exp, "imgs")))

    # --bf16 wiring (bf16 G/E compute + bf16 CAM/GBP VGG stack)
    exp16 = str(tmp_path / "exp_mis_bf16")
    main(
        ["--mtype", "1", "--img_size", "16", "--start_features", "128",
         "--random_init", "--iterations", "1", "--batch_size", "2",
         "--log_every", "1", "--experiment_dir", exp16, "--bf16"]
    )
    rec16 = json.loads(
        open(os.path.join(exp16, "Loss.txt")).read().strip().splitlines()[-1]
    )
    assert np.isfinite(rec16["loss_mask_mse"]) and np.isfinite(rec16["loss_grad_mse"])


@pytest.mark.heavy
def test_synthesize_cli_biggan(tmp_path):
    from tpugan.cli.synthesize import main
    from tpugan.models import BigGANConfig

    cfg = BigGANConfig(
        output_dim=16, z_dim=8, class_embed_dim=8, channel_width=4,
        num_classes=10,
        layers=[(False, 16, 16), (True, 16, 8), (False, 8, 4), (True, 4, 2), (False, 2, 1)],
        attention_layer_position=1,
    )
    cfg_path = str(tmp_path / "biggan.json")
    open(cfg_path, "w").write(cfg.to_json_string())
    exp = str(tmp_path / "exp_syn4")
    main(
        ["--mtype", "4", "--img_size", "16", "--z_dim", "8", "--random_init",
         "--batch_size", "2", "--count", "1", "--start_features", "128",
         "--config_dir", cfg_path, "--experiment_dir", exp]
    )
    assert "seed30000.png" in os.listdir(os.path.join(exp, "imgs"))


@pytest.mark.heavy
def test_embedding_cli_biggan_optimize_e(tmp_path):
    """mtype-4 inversion: fixed class condition, conditional encoder with
    live spectral norm, fine-tune-E mode (embedding_v2_BigGAN.py)."""
    from tpugan.cli.embedding import main
    from tpugan.io.image import save_image
    from tpugan.models import BigGANConfig

    cfg = BigGANConfig(
        output_dim=16, z_dim=8, class_embed_dim=8, channel_width=4,
        num_classes=10,
        layers=[(False, 16, 16), (True, 16, 8), (False, 8, 4), (True, 4, 2), (False, 2, 1)],
        attention_layer_position=1,
    )
    cfg_path = str(tmp_path / "biggan.json")
    open(cfg_path, "w").write(cfg.to_json_string())

    img_dir = str(tmp_path / "imgs_in")
    os.makedirs(img_dir)
    rngs = np.random.RandomState(0)
    save_image(os.path.join(img_dir, "0.png"), rngs.rand(16, 16, 3).astype(np.float32))

    exp = str(tmp_path / "exp_embed_big")
    main(
        ["--mtype", "4", "--img_size", "16", "--z_dim", "8", "--random_init",
         "--iterations", "2", "--batch_size", "1", "--optimizeE", "true",
         "--class_id", "3", "--img_dir", img_dir, "--experiment_dir", exp,
         "--start_features", "128", "--config_dir", cfg_path]
    )
    assert os.path.exists(os.path.join(exp, "models", "w_all.npy"))
    w_all = np.load(os.path.join(exp, "models", "w_all.npy"))
    assert w_all.shape[-1] == 8  # BigGAN z head

    # --bf16 fine-tune-E: bf16_encode_images wrapper + bf16 cond_vector
    # (the conditional-BN dtype path); outputs stay fp32
    exp16 = str(tmp_path / "exp_embed_big16")
    main(
        ["--mtype", "4", "--img_size", "16", "--z_dim", "8", "--random_init",
         "--iterations", "2", "--batch_size", "1", "--optimizeE", "true",
         "--class_id", "3", "--img_dir", img_dir, "--experiment_dir", exp16,
         "--start_features", "128", "--config_dir", cfg_path, "--bf16"]
    )
    w16 = np.load(os.path.join(exp16, "models", "w_all.npy"))
    assert w16.dtype == np.float32 and np.all(np.isfinite(w16))


def _fake_lpips_state_dict():
    """lpips-package (net='vgg') layout: VGG16 convs under net.sliceK.IDX,
    linear heads under lin{j}.model.1.weight — the exact key schema
    io/convert.py::lpips_vgg parses."""
    import torch

    # torchvision VGG16 feature indices -> (out_c, in_c); slice split per
    # lpips/pretrained_networks.py (slice1: 0-3, slice2: 4-8, slice3: 9-15,
    # slice4: 16-22, slice5: 23-29)
    convs = [
        (0, 64, 3), (2, 64, 64), (5, 128, 64), (7, 128, 128),
        (10, 256, 128), (12, 256, 256), (14, 256, 256),
        (17, 512, 256), (19, 512, 512), (21, 512, 512),
        (24, 512, 512), (26, 512, 512), (28, 512, 512),
    ]
    slice_of = lambda i: 1 if i <= 3 else 2 if i <= 8 else 3 if i <= 15 else 4 if i <= 22 else 5
    g = torch.Generator().manual_seed(11)
    state = {}
    for idx, out_c, in_c in convs:
        state[f"net.slice{slice_of(idx)}.{idx}.weight"] = (
            torch.randn(out_c, in_c, 3, 3, generator=g) * 0.05
        )
        state[f"net.slice{slice_of(idx)}.{idx}.bias"] = torch.randn(out_c, generator=g) * 0.05
    for j, c in enumerate((64, 128, 256, 512, 512)):
        state[f"lin{j}.model.1.weight"] = torch.randn(1, c, 1, 1, generator=g).abs() * 0.1
    return state


def test_build_lpips_fn_bf16_wiring(tmp_path):
    """--bf16 routes the CLI's LPIPS closure through the benched bf16 path
    (bf16 backbone weights + input casts, fp32 distances out) and stays
    close to the fp32 closure."""
    import types

    import jax.numpy as jnp
    import torch

    from tpugan.cli.common import build_lpips_fn

    path = str(tmp_path / "lpips_vgg.pth")
    torch.save(_fake_lpips_state_dict(), path)

    a = jnp.asarray(np.random.RandomState(3).rand(2, 32, 32, 3) * 2 - 1, jnp.float32)
    b = jnp.asarray(np.random.RandomState(4).rand(2, 32, 32, 3) * 2 - 1, jnp.float32)

    fp32_fn = build_lpips_fn(types.SimpleNamespace(lpips_weights=path))
    d32 = fp32_fn(a, b)
    assert d32.dtype == jnp.float32 and np.all(np.isfinite(d32))

    bf16_fn = build_lpips_fn(types.SimpleNamespace(lpips_weights=path, bf16=True))
    d16 = bf16_fn(a, b)
    assert d16.dtype == jnp.float32  # distances come back fp32
    assert np.allclose(np.asarray(d16), np.asarray(d32), rtol=0.05, atol=1e-3)
    # feature-precompute hook survives the wrapper (inversion cache path)
    feats = bf16_fn.features(a)
    assert all(f.dtype == jnp.bfloat16 for f in feats)
    d16_cached = bf16_fn(a, b, a_feats=feats)
    assert np.allclose(np.asarray(d16_cached), np.asarray(d16), atol=1e-6)


@pytest.mark.heavy
def test_e_align_cli_checkpoint_and_resume(tmp_path):
    """--checkpoint_every reaches save_checkpoint, and a broken run
    resumed with --resume lands on the SAME step_4 checkpoint (bitwise
    params + optimizer state) as an unbroken run."""
    import jax
    import orbax.checkpoint as ocp

    from tpugan.cli.e_align import main
    from tpugan.io.checkpoint import latest_step

    common = ["--mtype", "1", *TINY, "--batch_size", "2", "--log_every", "1",
              "--checkpoint_every", "2"]
    exp_a = str(tmp_path / "unbroken")
    main([*common, "--iterations", "5", "--experiment_dir", exp_a])
    models_a = os.path.join(exp_a, "models")
    assert latest_step(models_a) == 4  # saved at iterations 2 and 4

    exp_b = str(tmp_path / "broken")
    main([*common, "--iterations", "3", "--experiment_dir", exp_b])
    models_b = os.path.join(exp_b, "models")
    assert latest_step(models_b) == 2
    main([*common, "--iterations", "5", "--resume", "--experiment_dir", exp_b])
    assert latest_step(models_b) == 4

    # Loss.txt appended across the break: 3 + 2 records at log_every=1
    lines = open(os.path.join(exp_b, "Loss.txt")).read().strip().splitlines()
    assert len(lines) == 5
    assert json.loads(lines[-1])["iteration"] == 4

    ckptr = ocp.StandardCheckpointer()
    sa = ckptr.restore(os.path.join(os.path.abspath(models_a), "step_4"))
    sb = ckptr.restore(os.path.join(os.path.abspath(models_b), "step_4"))
    la, lb = jax.tree.leaves(sa), jax.tree.leaves(sb)
    assert len(la) == len(lb) and len(la) > 0
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
