import numpy as np

from syncfusion_tpu.eval.panels import spec_to_image, write_spec_panel


def test_spec_to_image_shape():
    spec = np.random.default_rng(0).random((80, 160))
    img = spec_to_image(spec, upscale=1)
    assert img.size == (160, 80)


def test_write_spec_panel(tmp_path):
    rng = np.random.default_rng(0)
    path = write_spec_panel(
        tmp_path, "recon",
        {"inputs": rng.random((20, 40)), "reconstructions": rng.random((20, 40))},
        step=7,
    )
    assert path.exists() and path.suffix == ".png"
