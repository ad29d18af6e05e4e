"""Shape dataset tests: the analytic generator must reproduce the
reference's published dataset structure (SURVEY.md C15/C16)."""

import numpy as np
import pytest

from sparsifyme_tpu.models.resnet_shapes import (
    all_model_shapes,
    benchmark_shapes,
    resnet_conv_shapes,
)
from sparsifyme_tpu.utils.shapes import LayerShape, read_shapes, write_shapes

# Row counts and unique-shape counts of the reference CSVs
# (datasets/*.csv; SURVEY.md C16).
EXPECTED = {
    "resnet18": (17, 8),
    "resnet34": (33, 8),
    "resnet50": (49, 17),
    "resnet101": (100, 17),
    "resnet152": (151, 17),
}


@pytest.mark.parametrize("name,expect", sorted(EXPECTED.items()))
def test_row_and_unique_counts(name, expect):
    shapes = resnet_conv_shapes(name)
    n_rows, n_unique = expect
    assert len(shapes) == n_rows
    assert len(set(shapes)) == n_unique


def test_resnet50_first_rows_match_published():
    # First rows of the reference's shapes.csv / BASELINE.md table.
    s = benchmark_shapes()
    assert s[0] == LayerShape(12544, 64, 147, 32)   # conv1 7x7 s2
    assert s[1] == LayerShape(12544, 64, 64, 32)    # layer1.0 1x1
    assert s[2] == LayerShape(12544, 64, 576, 32)   # layer1.0 3x3
    assert s[3] == LayerShape(12544, 256, 64, 32)   # layer1.0 1x1 exp
    assert s[4] == LayerShape(12544, 64, 256, 32)   # layer1.1 1x1


def test_resnet50_value_domains():
    s = benchmark_shapes()
    assert set(x.m for x in s) == {12544, 3136, 784, 196}
    assert all(x.b == 32 for x in s)
    assert min(x.n for x in s) == 64 and max(x.n for x in s) == 2048
    assert min(x.k for x in s) == 64 and max(x.k for x in s) == 4608


def test_resnet18_tail_rows():
    s = resnet_conv_shapes("resnet18")
    assert s[-1] == LayerShape(196, 512, 4608, 32)
    assert s[-4] == LayerShape(196, 512, 2304, 32)


def test_csv_roundtrip(tmp_path):
    shapes = benchmark_shapes()
    path = str(tmp_path / "shapes.csv")
    write_shapes(path, shapes)
    back = read_shapes(path)
    assert back == shapes


def test_read_shapes_from_text():
    text = "m,n,k,b\n128,64,256,4\n64,32,128,2\n"
    got = read_shapes(text)
    assert got == [LayerShape(128, 64, 256, 4), LayerShape(64, 32, 128, 2)]


def test_all_models_present():
    # The ResNet family (EXPECTED) plus the rest of the reference zoo.
    assert set(EXPECTED) <= set(all_model_shapes())


def test_conv_zoo_families():
    """The reference datagen zoo (`get_shapes.py:87-98`) minus resnets:
    conv counts match the published architectures."""
    from sparsifyme_tpu.models.conv_zoo import zoo_conv_shapes

    zoo = zoo_conv_shapes(batch=32)
    # torchvision module Conv2d counts: mobilenet_v2 has 52 convs;
    # densenet161: 1 stem + 78 layers * 2 + 3 transitions = 160;
    # densenet201: 1 + 98 * 2 + 3 = 200.
    assert len(zoo["mobilenetv2"]) == 52
    assert len(zoo["densenet161"]) == 160
    assert len(zoo["densenet201"]) == 200
    for name, shapes in zoo.items():
        for s in shapes:
            assert s.m >= 1 and s.n >= 8 and s.k >= 8 and s.b == 32, (
                name, s)
    # Spot-check known shapes: mobilenetv2 head 1x1 conv at 7x7 spatial.
    head = zoo["mobilenetv2"][-1]
    assert (head.m, head.n, head.k) == (49, 1280, 320)
    # densenet201 first dense-layer 1x1: 56x56, 64 -> 128.
    first = zoo["densenet201"][1]
    assert (first.m, first.n, first.k) == (3136, 128, 64)


def test_all_model_shapes_includes_zoo():
    from sparsifyme_tpu.models.resnet_shapes import all_model_shapes

    names = set(all_model_shapes())
    assert {"resnet18", "resnet50", "mobilenetv2", "mobilenetv3_small",
            "mobilenetv3_large", "densenet161", "densenet201"} <= names
