"""DemoCLIP: a small text+pixel teacher trained into a GENUINELY SHARED
embedding space — the zero-egress stand-in for LSeg/CLIP that actually
produces semantics.

Why this exists: the reference's open-vocabulary path distills LSeg pixel
features (CLIP-aligned) into the field and matches rendered features
against CLIP text embeddings (/root/reference/autolabel/features/
lseg.py:9-66, evaluation.py:295-327). Real LSeg/CLIP weights need a
network download; the deterministic fallbacks keep the plumbing runnable
but share NO embedding space (random pixel projections vs hashed text
vectors), so open-vocab mIoU is ~0 by construction. DemoCLIP closes that
gap the honest way: a tiny convolutional pixel tower and a tiny (real
architecture) CLIP text transformer are trained CONTRASTIVELY against
each other on a labeled scene with a synonym-augmented prompt bank —
after training, novel prompts embed near the pixels they describe, and
the full config-5 pipeline (features.hdf -> 512-d feature field ->
language/evaluate.py) produces above-chance semantics end to end.

This is a demonstration teacher, not a foundation model: it knows the
vocabulary of its prompt bank (plus whatever compositional generalization
the text transformer learns), not open-world English. Drop real weights
in via AUTOLABEL_CLIP_WEIGHTS to replace it.

Checkpoint format: a single .npz with the pixel-tower conv weights, the
text-tower parameter tree (features/clip_text_jax.py layout), the tiny
text config, and the character-level BPE vocabulary (no merges — prompts
tokenize to bytes, so ANY ascii prompt is encodable).
"""
import json
import os

import numpy as np

FEATURE_DIM = 512
STRIDE = 2

# Tiny but real CLIP text tower (causal transformer, QuickGELU, EOT
# pooling, projection — features/clip_text_jax.encode_tokens). Round 5
# grew it a notch (128x2 -> 192x3) for compositional binding: the 128x2
# tower collapsed "sphere colored blue" onto the red-ball cluster
# (BASELINE.md round 3 held-out table).
_TEXT_CONFIG = dict(vocab_size=514, width=192, depth=3, heads=6,
                    context_length=32, embed_dim=FEATURE_DIM)


def _char_tokenizer():
    """Character-level tokenizer: a merges file with no merge rules, so
    tokens are single bytes and ANY ascii prompt is encodable.
    514 ids = 256 bytes + 256 word-final forms + SOT/EOT."""
    import tempfile

    from autolabel_tpu.features import clip_text_jax
    with tempfile.NamedTemporaryFile('w', suffix='.txt', delete=False) as f:
        f.write('demo-clip character-level vocab (no merges)\n')
        path = f.name
    try:
        return clip_text_jax.SimpleTokenizer(path)
    finally:
        os.unlink(path)


# -- pixel tower ---------------------------------------------------------------


def _conv_init(key, k, c_in, c_out):
    import jax
    scale = (2.0 / (k * k * c_in)) ** 0.5
    return jax.random.normal(key, (k, k, c_in, c_out)) * scale


def init_pixel_params(key, hidden=64):
    import jax
    keys = jax.random.split(key, 5)
    return {
        # stride-2 stem, then dilated 3x3s growing the receptive field to
        # ~30 px so context (not just pixel color) feeds the embedding.
        'conv1': _conv_init(keys[0], 3, 3, hidden),
        'conv2': _conv_init(keys[1], 3, hidden, hidden),
        'conv3': _conv_init(keys[2], 3, hidden, hidden),
        'proj': _conv_init(keys[3], 1, hidden, FEATURE_DIM),
    }


def apply_pixel_tower(params, images):
    """images: (B, H, W, 3) float in [0, 1] -> (B, H/2, W/2, D) UNIT-NORM."""
    import jax
    import jax.numpy as jnp

    def conv(x, w, stride=1, dilation=1):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(stride, stride), padding='SAME',
            rhs_dilation=(dilation, dilation),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    x = images - 0.5
    x = jax.nn.relu(conv(x, params['conv1'], stride=STRIDE))
    x = jax.nn.relu(conv(x, params['conv2'], dilation=2))
    x = jax.nn.relu(conv(x, params['conv3'], dilation=4))
    x = conv(x, params['proj'])
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-6)


# -- prompt bank ---------------------------------------------------------------

# Synonym-augmented prompts for the procedural room scene (tests/room.py
# classes). Training samples one synonym per class per step; held-out
# phrasings ("TEST" entries in docs) are reserved for evaluation.
ROOM_PROMPT_BANK = {
    1: ['wall', 'the wall', 'a checkered wall', 'background',
        'the room walls', 'wall of the room'],
    2: ['red ball', 'a red ball', 'the red sphere', 'red round object',
        'a ball that is red', 'crimson ball'],
    3: ['green box', 'a green box', 'the green cube', 'green crate',
        'a box that is green', 'green block'],
    4: ['blue ball', 'a blue ball', 'the blue sphere', 'blue round object',
        'a ball that is blue', 'azure ball'],
    5: ['yellow pillar', 'a yellow pillar', 'the yellow column',
        'tall yellow box', 'a pillar that is yellow', 'yellow post'],
}

# Attribute decomposition of the attribute-bearing room classes:
# color synonyms x shape nouns, combined through _TEMPLATES into
# compositional training prompts ("sphere colored blue", "a box that is
# green", ...). Classes absent here (the wall) train on their static
# synonyms only.
ROOM_ATTRIBUTES = {
    2: (['red', 'crimson', 'scarlet'],
        ['ball', 'sphere', 'orb', 'round object']),
    3: (['green', 'emerald'], ['box', 'cube', 'crate', 'block']),
    4: (['blue', 'azure'], ['ball', 'sphere', 'orb', 'round object']),
    5: (['yellow', 'golden'], ['pillar', 'column', 'post']),
}

# Compositional phrasing templates over (color c, noun n). Word order
# varies on BOTH sides of the noun so the text tower must bind the
# attribute wherever it appears, not read a positional shortcut.
_TEMPLATES = [
    '{c} {n}', 'a {c} {n}', 'the {c} {n}',
    '{n} colored {c}', 'a {n} colored {c}', 'the {n} colored {c}',
    '{c} colored {n}', 'a {n} that is {c}', 'the {n} in {c}',
    '{n} of {c} color',
]


def compositional_prompts(attributes):
    """(positives, negatives): per-class compositional phrasings plus
    WRONG-pairing hard negatives.

    positives: {class_id: [prompt, ...]} — every template over the
    class's own (color, noun) pairs. negatives: [prompt, ...] — every
    template over (color of class A, noun of class B) pairs where no
    class owns that combination (e.g. 'red box', 'pillar colored
    blue'). Negatives enter the InfoNCE softmax as extra distractor
    columns no pixel may match, which forces genuine attribute binding:
    without them, 'blue' and 'ball' can embed as one fused symbol and
    any novel pairing collapses onto the nearest training cluster (the
    round-3 held-out failure).
    """
    positives = {}
    for cid, (colors, nouns) in attributes.items():
        positives[cid] = [t.format(c=c, n=n) for t in _TEMPLATES
                          for c in colors for n in nouns]
    negatives = []
    for _, (colors_a, _) in attributes.items():
        for _, (_, nouns_b) in attributes.items():
            for c in colors_a:
                for n in nouns_b:
                    # Skip (color, noun) pairs some class genuinely owns
                    # (class 2 and 4 share nouns: 'blue ball' belongs to
                    # class 4 and must never be a negative).
                    owned = any(c in cs and n in ns
                                for cs, ns in attributes.values())
                    if owned:
                        continue
                    negatives.extend(t.format(c=c, n=n)
                                     for t in _TEMPLATES)
    return positives, sorted(set(negatives))


# -- training ------------------------------------------------------------------


def train_demo_teacher(scene_dir, out_path, prompt_bank=None, iters=2500,
                       crop=96, lr=2e-3, seed=0, frames_stride=4,
                       log_every=200, attributes=None, n_negatives=8):
    """Contrastive text<->pixel training on a scene with dense gt labels.

    Each step crops a random window from a random frame, embeds its
    pixels with the pixel tower and one sampled phrasing per class with
    the text tower, and minimizes InfoNCE over classes per labeled
    pixel. Both towers train jointly from scratch — the shared space is
    LEARNED, not constructed. Saves the .npz checkpoint to out_path.

    attributes ({class_id: (colors, nouns)}; defaults to
    ROOM_ATTRIBUTES when no custom prompt_bank is given) expands each
    class's phrasings with every _TEMPLATES compositional wording of
    its own (color, noun) pairs, and adds `n_negatives` WRONG-pairing
    hard negatives ('red box', 'pillar colored blue', ...) to every
    step's InfoNCE softmax as distractor columns no pixel may match —
    the text tower must bind attributes compositionally instead of
    memorizing fused class symbols (the round-3 held-out failure mode).
    """
    import cv2
    import jax
    import jax.numpy as jnp
    import optax

    from autolabel_tpu.features import clip_text_jax

    if attributes is None:
        attributes = ROOM_ATTRIBUTES if prompt_bank is None else {}
    prompt_bank = prompt_bank or ROOM_PROMPT_BANK
    comp_pos, negatives = (compositional_prompts(attributes)
                           if attributes else ({}, []))
    prompt_bank = {cid: list(dict.fromkeys(
        list(syns) + comp_pos.get(cid, [])))
        for cid, syns in prompt_bank.items()}
    n_negatives = min(n_negatives, len(negatives))
    class_ids = sorted(prompt_bank)
    config = clip_text_jax.CLIPTextConfig(**_TEXT_CONFIG)
    tokenizer = _char_tokenizer()

    rgb_dir = os.path.join(scene_dir, 'rgb')
    sem_dir = os.path.join(scene_dir, 'gt_semantic')
    names = sorted(os.listdir(sem_dir),
                   key=lambda p: int(os.path.splitext(p)[0]))
    names = names[::frames_stride]
    images, labels = [], []
    for name in names:
        sem = cv2.imread(os.path.join(sem_dir, name), -1)
        rgb = cv2.cvtColor(
            cv2.imread(os.path.join(rgb_dir,
                                    os.path.splitext(name)[0] + '.png')),
            cv2.COLOR_BGR2RGB)
        images.append(rgb.astype(np.float32) / 255.0)
        labels.append(sem.astype(np.int32))
    images = np.stack(images)
    labels = np.stack(labels)

    # Pre-tokenize every synonym of every class once: (C, S, context).
    max_syn = max(len(v) for v in prompt_bank.values())
    tokens = np.zeros((len(class_ids), max_syn, config.context_length),
                      np.int32)
    n_syn = np.zeros(len(class_ids), np.int32)
    for ci, cid in enumerate(class_ids):
        toks = tokenizer.tokenize(prompt_bank[cid], config.context_length)
        tokens[ci, :len(toks)] = toks
        n_syn[ci] = len(toks)
    tokens = jnp.asarray(tokens)
    n_syn_np = n_syn.copy()
    n_syn = jnp.asarray(n_syn)
    if n_negatives:
        neg_tokens = jnp.asarray(np.stack(
            tokenizer.tokenize(negatives, config.context_length)))
    else:
        neg_tokens = jnp.zeros((0, config.context_length), jnp.int32)
    # gt class id -> contiguous [0, C) (and -1 for unknown ids).
    remap = np.full(int(max(class_ids)) + 1, -1, np.int32)
    for ci, cid in enumerate(class_ids):
        remap[cid] = ci

    key = jax.random.PRNGKey(seed)
    k_pix, k_txt, k_train = jax.random.split(key, 3)
    params = {
        'pixel': init_pixel_params(k_pix),
        'text': clip_text_jax.init_params(k_txt, config),
        'logit_scale': jnp.asarray(2.0),  # learned InfoNCE temperature
    }
    # The 192x3 tower diverges late under bare Adam at a constant lr
    # (loss NaN ~iter 2000, measured round 5: the learned temperature
    # and the hard-negative columns sharpen the softmax until one bad
    # batch spikes the gradient); clipping alone kept it finite but the
    # loss oscillated and never converged (0.17 -> 0.40 between logs).
    # The CLIP recipe itself is the fix: short warmup + cosine decay to
    # zero, so the late sharpened-softmax phase takes small steps, plus
    # clip + reject non-finite updates like the main trainer.
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=lr,
        warmup_steps=max(iters // 20, 1), decay_steps=iters)
    tx = optax.apply_if_finite(
        optax.chain(optax.clip_by_global_norm(1.0), optax.adam(schedule)),
        max_consecutive_errors=100)
    opt_state = tx.init(params)

    c = len(class_ids)
    out_hw = crop // STRIDE

    def loss_fn(p, crops, crop_labels, syn_choice, neg_choice):
        # crops: (B, crop, crop, 3); crop_labels: (B, out, out) in [-1, C).
        pix = apply_pixel_tower(p['pixel'], crops)  # (B, o, o, D) unit
        chosen = tokens[jnp.arange(c), syn_choice]  # (C, context)
        # Hard negatives join the softmax as distractor columns:
        # targets stay in [0, C), so any probability mass a wrong
        # pairing attracts is pure loss.
        chosen = jnp.concatenate(
            [chosen, jnp.take(neg_tokens, neg_choice, axis=0)])
        txt = clip_text_jax.encode_tokens(p['text'], chosen, config)
        txt = txt / (jnp.linalg.norm(txt, axis=-1, keepdims=True) + 1e-6)
        scale = jnp.exp(jnp.clip(p['logit_scale'], 0.0, 4.6))
        logits = scale * jnp.einsum('bhwd,cd->bhwc', pix, txt)
        n_cols = c + neg_choice.shape[0]
        valid = crop_labels >= 0
        targets = jnp.clip(crop_labels, 0, c - 1)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits.reshape(-1, n_cols), targets.reshape(-1))
        ce = jnp.where(valid.reshape(-1), ce, 0.0)
        return ce.sum() / jnp.maximum(valid.sum(), 1)

    @jax.jit
    def step(p, o, crops, crop_labels, syn_choice, neg_choice):
        loss, grads = jax.value_and_grad(loss_fn)(p, crops, crop_labels,
                                                  syn_choice, neg_choice)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    rng = np.random.default_rng(seed)
    n, h, w = labels.shape
    crop = min(crop, (h // STRIDE) * STRIDE, (w // STRIDE) * STRIDE)
    out_hw = crop // STRIDE
    batch = 8
    for it in range(iters):
        fi = rng.integers(0, n, batch)
        ys = rng.integers(0, h - crop + 1, batch)
        xs = rng.integers(0, w - crop + 1, batch)
        crops = np.stack([
            images[f, y:y + crop, x:x + crop] for f, y, x in zip(fi, ys, xs)
        ])
        lab = np.stack([
            labels[f, y:y + crop, x:x + crop] for f, y, x in zip(fi, ys, xs)
        ])
        # Label of each stride-cell = its top-left pixel's label (cells
        # mixing classes contribute a slightly noisy but unbiased signal).
        lab = remap[lab[:, ::STRIDE, ::STRIDE]]
        syn = rng.integers(0, n_syn_np)
        neg = (rng.integers(0, len(negatives), n_negatives)
               if n_negatives else np.zeros(0, np.int64))
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(crops), jnp.asarray(lab),
                                       jnp.asarray(syn, np.int32),
                                       jnp.asarray(neg, np.int32))
        if log_every and (it % log_every == 0 or it == iters - 1):
            print(f"demo-teacher iter {it}: loss {float(loss):.4f}",
                  flush=True)
    assert lab.shape[1:] == (out_hw, out_hw)

    save_checkpoint(out_path, params, prompt_bank)
    return params


def save_checkpoint(path, params, prompt_bank):
    import jax

    flat, treedef = jax.tree_util.tree_flatten(params)
    np.savez_compressed(
        path,
        meta=json.dumps({
            'text_config': _TEXT_CONFIG,
            'prompt_bank': {str(k): v for k, v in prompt_bank.items()},
            'n_leaves': len(flat),
        }),
        **{f'leaf_{i}': np.asarray(leaf) for i, leaf in enumerate(flat)})


def _load_checkpoint(path):
    import jax

    from autolabel_tpu.features import clip_text_jax

    with np.load(path, allow_pickle=False) as archive:
        meta = json.loads(str(archive['meta']))
        leaves = [archive[f'leaf_{i}'] for i in range(meta['n_leaves'])]
    config = clip_text_jax.CLIPTextConfig(**meta['text_config'])
    # Rebuild the treedef from a like-shaped skeleton.
    skeleton = {
        'pixel': init_pixel_params(jax.random.PRNGKey(0)),
        'text': clip_text_jax.init_params(jax.random.PRNGKey(0), config),
        'logit_scale': np.zeros(()),
    }
    treedef = jax.tree_util.tree_structure(skeleton)
    params = jax.tree_util.tree_unflatten(
        treedef, [np.asarray(leaf) for leaf in leaves])
    return params, config, meta


class DemoCLIPFE:
    """Feature-extractor interface (same contract as LSegFE): trained
    text+pixel towers from a demo-clip .npz checkpoint."""

    out_dim = FEATURE_DIM

    def __init__(self, checkpoint=None, allow_fallback=False):
        checkpoint = checkpoint or os.environ.get('AUTOLABEL_DEMO_TEACHER')
        if not checkpoint or not os.path.exists(checkpoint):
            raise RuntimeError(
                "DemoCLIP needs a trained checkpoint: pass --checkpoint "
                "(compute_feature_maps) / --feature-checkpoint "
                "(language/evaluate) or set AUTOLABEL_DEMO_TEACHER. "
                "Train one with scripts/train_demo_teacher.py.")
        import jax

        from autolabel_tpu.features import clip_text_jax

        self.params, self.config, self.meta = _load_checkpoint(checkpoint)
        self.tokenizer = _char_tokenizer()
        self._encode_tokens = jax.jit(
            lambda p, t: clip_text_jax.encode_tokens(p, t, self.config))
        self._apply_pixel = jax.jit(apply_pixel_tower)

    def shape(self, input_shape):
        return (input_shape[0] // STRIDE, input_shape[1] // STRIDE)

    def encode_text(self, prompts):
        tokens = self.tokenizer.tokenize(list(prompts),
                                         self.config.context_length)
        emb = np.asarray(
            self._encode_tokens(self.params['text'], tokens))
        return emb / (np.linalg.norm(emb, axis=-1, keepdims=True) + 1e-6)

    def __call__(self, x):
        """x: (B, 3, H, W) float in [0, 1] -> (B, H/2, W/2, 512) fp16."""
        images = np.asarray(x, np.float32).transpose(0, 2, 3, 1)
        out = self._apply_pixel(self.params['pixel'], images)
        return np.asarray(out, np.float16)
