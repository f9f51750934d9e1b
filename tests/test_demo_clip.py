"""DemoCLIP teacher: the trained text+pixel space is genuinely shared.

The fallback extractors keep the vision-language plumbing runnable but
share no embedding space (mIoU ~0 by construction). These tests prove the
demo teacher actually produces semantics: after a short contrastive
training run on a tiny room scene, HELD-OUT prompt phrasings classify
pixels well above chance through nothing but cosine similarity in the
shared space — the property the reference gets from LSeg/CLIP
(/root/reference/autolabel/features/lseg.py:40-66, evaluation.py:295-327).
"""
import numpy as np
import pytest

from autolabel_tpu.features import demo_clip

# Training/compile-heavy: excluded from the smoke tier (pytest -m 'not slow').
pytestmark = pytest.mark.slow



@pytest.fixture(scope='module')
def room_teacher(tmp_path_factory):
    from tests.room import make_room_scene
    scene = str(tmp_path_factory.mktemp('demo') / 'room')
    make_room_scene(scene, n_frames=6, width=80, height=60, label_every=1)
    ckpt = str(tmp_path_factory.mktemp('demo') / 'teacher.npz')
    demo_clip.train_demo_teacher(scene, ckpt, iters=250, crop=64,
                                 frames_stride=1, log_every=0, seed=3)
    return scene, ckpt


def test_checkpoint_roundtrip_and_contract(room_teacher):
    _, ckpt = room_teacher
    fe = demo_clip.DemoCLIPFE(ckpt)
    emb = fe.encode_text(['red ball', 'a green box'])
    assert emb.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-4)
    feats = fe(np.random.default_rng(0).random((2, 3, 60, 80),
                                               dtype=np.float32))
    assert feats.shape == (2, 30, 40, 512)
    assert feats.dtype == np.float16
    assert fe.shape((60, 80)) == (30, 40)


def test_dispatch_registration(room_teacher, monkeypatch):
    _, ckpt = room_teacher
    from autolabel_tpu.features.feature_utils import get_feature_extractor
    fe = get_feature_extractor('demo', checkpoint=ckpt)
    assert fe.out_dim == 512
    # Missing checkpoint fails loudly, not silently random.
    monkeypatch.delenv('AUTOLABEL_DEMO_TEACHER', raising=False)
    with pytest.raises(RuntimeError, match='checkpoint'):
        get_feature_extractor('demo')


def test_heldout_prompts_classify_pixels_above_chance(room_teacher):
    """Novel phrasings (never seen in training) must still land near the
    pixels they describe — the shared space generalizes over wording,
    it is not a lookup table of training prompts."""
    import cv2
    scene, ckpt = room_teacher
    fe = demo_clip.DemoCLIPFE(ckpt)

    heldout = {1: 'a wall with checkers', 2: 'sphere colored red',
               3: 'box colored green', 4: 'sphere colored blue',
               5: 'pillar colored yellow'}
    class_ids = sorted(heldout)
    text = fe.encode_text([heldout[c] for c in class_ids])

    rgb = cv2.cvtColor(cv2.imread(f'{scene}/rgb/0.png'),
                       cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
    gt = cv2.imread(f'{scene}/gt_semantic/0.png', -1)
    feats = fe(rgb.transpose(2, 0, 1)[None])[0].astype(np.float32)

    pred = np.argmax(feats @ text.T, axis=-1)
    gt_ds = gt[::demo_clip.STRIDE, ::demo_clip.STRIDE]
    gt_ds = gt_ds[:feats.shape[0], :feats.shape[1]]
    remap = {c: i for i, c in enumerate(class_ids)}
    gt_idx = np.vectorize(lambda v: remap.get(v, -1))(gt_ds)
    valid = gt_idx >= 0
    acc = float((pred[valid] == gt_idx[valid]).mean())
    # Chance is ~0.2 (5 classes; walls dominate, majority-class ~0.75 —
    # require clearly above BOTH).
    assert acc > 0.8, acc
