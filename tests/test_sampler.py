"""IndexSampler semantics (models the reference's only unit tests,
test/test_sampling.py: class discovery w/ null exclusion, class-conditional
sampling, labeled-image enumeration)."""
import numpy as np

from autolabel_tpu.core.sampler import IndexSampler


def test_class_discovery_excludes_null():
    sampler = IndexSampler()
    maps = np.zeros((2, 10), dtype=int)
    maps[0, :3] = 1
    maps[1, 5:] = 2
    sampler.update(maps)
    assert sorted(sampler.classes.tolist()) == [1, 2]
    assert sampler.has_semantics


def test_no_labels():
    sampler = IndexSampler()
    sampler.update(np.zeros((2, 10), dtype=int))
    assert len(sampler.classes) == 0
    assert not sampler.has_semantics
    assert sampler.semantic_indices() == []


def test_sample_returns_labeled_pixels():
    sampler = IndexSampler()
    maps = np.zeros((2, 10), dtype=int)
    maps[0, [1, 4, 7]] = 2
    maps[1, [0, 9]] = 3
    sampler.update(maps)

    for _ in range(20):
        image, pixels = sampler.sample(2, count=5)
        assert image == 0
        assert set(pixels).issubset({1, 4, 7})
        image, pixels = sampler.sample(3, count=5)
        assert image == 1
        assert set(pixels).issubset({0, 9})


def test_image_weights_proportional():
    sampler = IndexSampler()
    maps = np.zeros((2, 100), dtype=int)
    maps[0, :10] = 1  # 10 pixels
    maps[1, :90] = 1  # 90 pixels
    sampler.update(maps)
    np.testing.assert_allclose(sampler.image_weights[1], [0.1, 0.9])


def test_semantic_indices():
    sampler = IndexSampler()
    maps = np.zeros((4, 10), dtype=int)
    maps[1, 0] = 1
    maps[3, 2] = 5
    sampler.update(maps)
    assert sampler.semantic_indices() == [1, 3]
