import jax
import jax.numpy as jnp
import numpy as np
import pytest

from syncfusion_tpu.core import (
    MeshSpec,
    create_mesh,
    data_sharding,
    shard_batch,
    local_batch_size,
)
from syncfusion_tpu.core.config import Config, load_config, instantiate, merge, resolve
from syncfusion_tpu.core.prng import RngStream


def test_mesh_creation():
    mesh = create_mesh()
    assert mesh.shape["data"] == 8
    assert mesh.shape["model"] == 1


def test_mesh_spec_resolution():
    assert MeshSpec(-1, 2).resolve(8) == (4, 2)
    with pytest.raises(ValueError):
        MeshSpec(3, 1).resolve(8)


def test_shard_batch_places_on_data_axis():
    mesh = create_mesh()
    batch = {"x": np.ones((16, 4), np.float32), "y": np.zeros((16,), np.float32)}
    out = shard_batch(batch, mesh)
    assert out["x"].sharding == data_sharding(mesh, 2)
    assert local_batch_size(16, mesh) == 2


def test_sharded_computation_matches_single_device():
    mesh = create_mesh()
    x = np.random.default_rng(0).normal(size=(16, 32)).astype(np.float32)
    xs = shard_batch(x, mesh)
    f = jax.jit(lambda a: jnp.tanh(a) @ jnp.ones((32, 8)))
    np.testing.assert_allclose(f(xs), f(x), rtol=1e-6)


def test_config_merge_and_interpolation(tmp_path):
    (tmp_path / "config.yaml").write_text(
        "length: 262144\nsampling_rate: 48000\nexp: null\nmodel:\n  size: 8\n"
    )
    (tmp_path / "exp").mkdir()
    (tmp_path / "exp" / "train.yaml").write_text(
        "train: true\nchunk: ${length}\nmodel:\n  lr: 1e-4\n"
    )
    cfg = load_config(tmp_path / "config.yaml", ["exp=train", "model.size=16", "+extra=hi"])
    assert cfg.chunk == 262144
    assert cfg.model.size == 16
    assert cfg.model.lr == 1e-4
    assert cfg.extra == "hi"
    assert cfg.train is True


def test_config_defaults_group(tmp_path):
    (tmp_path / "config.yaml").write_text("exp: null\n")
    (tmp_path / "exp").mkdir()
    (tmp_path / "exp" / "model").mkdir()
    (tmp_path / "exp" / "model" / "diffusion.yaml").write_text("model:\n  channels: 8\n")
    (tmp_path / "exp" / "main.yaml").write_text(
        "defaults:\n  - model: diffusion\nmodel:\n  lr: 2.0\n"
    )
    cfg = load_config(tmp_path / "config.yaml", ["exp=main"])
    assert cfg.model.channels == 8
    assert cfg.model.lr == 2.0


def test_config_env_interpolation(tmp_path, monkeypatch):
    monkeypatch.setenv("MY_DIR", "/tmp/x")
    (tmp_path / "config.yaml").write_text("logs: ${oc.env:MY_DIR}/runs\n")
    cfg = load_config(tmp_path / "config.yaml")
    assert cfg.logs == "/tmp/x/runs"


def test_instantiate_target_and_partial():
    node = Config.wrap(
        {
            "_target_": "collections.OrderedDict",
            "a": {"_target_": "builtins.int", "_partial_": True},
        }
    )
    obj = instantiate(node)
    assert obj["a"]() == 0


def test_instantiate_class_path_dialect():
    node = Config.wrap({"class_path": "fractions.Fraction", "init_args": {"numerator": 3}})
    assert instantiate(node) == 3


def test_override_requires_plus_for_new_keys(tmp_path):
    (tmp_path / "config.yaml").write_text("a: 1\n")
    with pytest.raises(KeyError):
        load_config(tmp_path / "config.yaml", ["b=2"])


def test_rng_stream_determinism():
    s1, s2 = RngStream(7), RngStream(7)
    k1 = s1.keys(3, ("noise", "time"))
    k2 = s2.keys(3, ("noise", "time"))
    assert jnp.array_equal(jax.random.key_data(k1["noise"]), jax.random.key_data(k2["noise"]))
    assert not jnp.array_equal(
        jax.random.key_data(k1["noise"]), jax.random.key_data(k1["time"])
    )


def test_repo_configs_parse_numbers_as_floats():
    """Every cfg/ and exp/ yaml must load via the project loader with NO
    numeric-looking strings left behind (pyyaml reads `1e-8` as a STRING,
    which later explodes inside jitted optimizers — seen live: onset
    trainer abort on eps='1e-8')."""
    import re
    from pathlib import Path

    from syncfusion_tpu.core.config import yaml_load

    num = re.compile(r"^[-+]?(\d+\.?\d*|\.\d+)([eE][-+]?\d+)$")
    offenders = []

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{path}.{k}")
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(v, f"{path}[{i}]")
        elif isinstance(node, str) and num.match(node):
            offenders.append(f"{path} = {node!r}")

    root = Path(__file__).resolve().parents[1]
    files = list((root / "cfg").rglob("*.yaml")) + list((root / "exp").rglob("*.yaml"))
    assert files
    for f in files:
        walk(yaml_load(open(f)) or {}, str(f.relative_to(root)))
    assert not offenders, offenders
