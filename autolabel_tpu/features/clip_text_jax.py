"""JAX CLIP text encoder — the open-vocabulary query tower, TPU-native.

The reference's vision-language path embeds class prompts with CLIP's
text transformer via the lang-seg module
(/root/reference/autolabel/features/lseg.py:40-52) and matches rendered
LSeg pixel features against them by cosine similarity. The lang-seg
package and pretrained weights need a network to fetch, so — following
the pattern of features/vit_jax.py — this module provides:

  - the full CLIP text transformer forward in JAX (token + positional
    embeddings, causal pre-LN blocks with QuickGELU, final LayerNorm,
    EOT-token pooling, text projection), matching the OpenAI
    architecture exactly;
  - loaders for BOTH checkpoint namings: the OpenAI `clip` state dict
    the official weights ship with (load_openai_state_dict) and the
    HuggingFace transformers naming (load_hf_state_dict);
  - the byte-pair tokenizer (SimpleTokenizer) reading the standard
    `bpe_simple_vocab_16e6.txt.gz` merges file;
  - numerical validation against transformers' CLIPTextModelWith-
    Projection with SHARED random weights (tests/test_clip_text_jax.py)
    — so when real weights are supplied
    (AUTOLABEL_CLIP_WEIGHTS=<ViT-B-32.pt or state dict>,
    AUTOLABEL_CLIP_BPE=<bpe_simple_vocab_16e6.txt.gz>) the path is
    already proven correct end to end.
"""
import dataclasses
import gzip
import html
import os
import re

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    width: int = 512
    depth: int = 12
    heads: int = 8
    context_length: int = 77
    embed_dim: int = 512

    @property
    def head_dim(self):
        return self.width // self.heads


CLIP_VIT_B = CLIPTextConfig()
# ViT-L/14's text tower (what LSeg's clip_vitl16_384 backbone pairs with
# is the ViT-B text width 512; CLIP ViT-L uses width 768):
CLIP_VIT_L = CLIPTextConfig(width=768, depth=12, heads=12, embed_dim=768)


def init_params(key, config=CLIP_VIT_B):
    """Random-init parameter tree with the loader-compatible layout."""
    w = config.width
    keys = iter(jax.random.split(key, 4 + 6 * config.depth))

    def dense(key, d_in, d_out):
        scale = (2.0 / (d_in + d_out)) ** 0.5
        return {'w': jax.random.normal(key, (d_in, d_out)) * scale,
                'b': jnp.zeros((d_out,))}

    params = {
        'token_embedding': jax.random.normal(
            next(keys), (config.vocab_size, w)) * 0.02,
        'pos_embed': jax.random.normal(
            next(keys), (config.context_length, w)) * 0.01,
        'ln_final': {'scale': jnp.ones((w,)), 'bias': jnp.zeros((w,))},
        'text_projection': jax.random.normal(
            next(keys), (w, config.embed_dim)) * w ** -0.5,
        'blocks': [],
    }
    for _ in range(config.depth):
        params['blocks'].append({
            'ln1': {'scale': jnp.ones((w,)), 'bias': jnp.zeros((w,))},
            'ln2': {'scale': jnp.ones((w,)), 'bias': jnp.zeros((w,))},
            'qkv': dense(next(keys), w, 3 * w),
            'proj': dense(next(keys), w, w),
            'fc1': dense(next(keys), w, 4 * w),
            'fc2': dense(next(keys), 4 * w, w),
        })
    return params


# -- weight import -----------------------------------------------------------


def _t(array):
    return jnp.asarray(np.asarray(array), jnp.float32)


def _infer_depth(state_dict, prefix):
    depth = 0
    while any(k.startswith(f'{prefix}{depth}.') for k in state_dict):
        depth += 1
    return depth


def load_openai_state_dict(state_dict, config=None):
    """OpenAI `clip` naming: token_embedding.weight, positional_embedding,
    transformer.resblocks.N.{attn.in_proj_*, attn.out_proj, ln_1, ln_2,
    mlp.c_fc, mlp.c_proj}, ln_final, text_projection. Accepts the full
    CLIP state dict (visual.* keys are ignored); config=None infers
    depth/width from the checkpoint."""
    if config is None:
        width = int(np.asarray(state_dict['ln_final.weight']).shape[0])
        config = CLIPTextConfig(
            vocab_size=int(
                np.asarray(state_dict['token_embedding.weight']).shape[0]),
            width=width,
            depth=_infer_depth(state_dict, 'transformer.resblocks.'),
            # All released CLIP text towers use 64-dim heads; pass an
            # explicit config for nonstandard widths.
            heads=max(1, width // 64),
            context_length=int(
                np.asarray(state_dict['positional_embedding']).shape[0]),
            embed_dim=int(
                np.asarray(state_dict['text_projection']).shape[1]))
    params = {
        'token_embedding': _t(state_dict['token_embedding.weight']),
        'pos_embed': _t(state_dict['positional_embedding']),
        'ln_final': {'scale': _t(state_dict['ln_final.weight']),
                     'bias': _t(state_dict['ln_final.bias'])},
        'text_projection': _t(state_dict['text_projection']),
        'blocks': [],
    }
    for i in range(config.depth):
        pre = f'transformer.resblocks.{i}.'
        params['blocks'].append({
            'ln1': {'scale': _t(state_dict[pre + 'ln_1.weight']),
                    'bias': _t(state_dict[pre + 'ln_1.bias'])},
            'ln2': {'scale': _t(state_dict[pre + 'ln_2.weight']),
                    'bias': _t(state_dict[pre + 'ln_2.bias'])},
            'qkv': {'w': _t(state_dict[pre + 'attn.in_proj_weight']).T,
                    'b': _t(state_dict[pre + 'attn.in_proj_bias'])},
            'proj': {'w': _t(state_dict[pre + 'attn.out_proj.weight']).T,
                     'b': _t(state_dict[pre + 'attn.out_proj.bias'])},
            'fc1': {'w': _t(state_dict[pre + 'mlp.c_fc.weight']).T,
                    'b': _t(state_dict[pre + 'mlp.c_fc.bias'])},
            'fc2': {'w': _t(state_dict[pre + 'mlp.c_proj.weight']).T,
                    'b': _t(state_dict[pre + 'mlp.c_proj.bias'])},
        })
    return params, config


def load_hf_state_dict(state_dict, config=None):
    """HuggingFace CLIPTextModelWithProjection naming (validation
    vehicle): text_model.encoder.layers.N.self_attn.{q,k,v,out}_proj…"""
    if config is None:
        width = int(np.asarray(
            state_dict['text_model.final_layer_norm.weight']).shape[0])
        config = CLIPTextConfig(
            vocab_size=int(np.asarray(
                state_dict['text_model.embeddings.token_embedding.weight']
            ).shape[0]),
            width=width,
            depth=_infer_depth(state_dict, 'text_model.encoder.layers.'),
            heads=max(1, width // 64),
            context_length=int(np.asarray(
                state_dict['text_model.embeddings.position_embedding.weight']
            ).shape[0]),
            embed_dim=int(
                np.asarray(state_dict['text_projection.weight']).shape[0]))
    params = {
        'token_embedding': _t(
            state_dict['text_model.embeddings.token_embedding.weight']),
        'pos_embed': _t(
            state_dict['text_model.embeddings.position_embedding.weight']),
        'ln_final': {
            'scale': _t(state_dict['text_model.final_layer_norm.weight']),
            'bias': _t(state_dict['text_model.final_layer_norm.bias'])},
        # HF stores the projection as a Linear (out, in); OpenAI as (in, out).
        'text_projection': _t(state_dict['text_projection.weight']).T,
        'blocks': [],
    }
    for i in range(config.depth):
        pre = f'text_model.encoder.layers.{i}.'
        qkv_w = jnp.concatenate([
            _t(state_dict[pre + f'self_attn.{k}_proj.weight']).T
            for k in ('q', 'k', 'v')], axis=1)
        qkv_b = jnp.concatenate([
            _t(state_dict[pre + f'self_attn.{k}_proj.bias'])
            for k in ('q', 'k', 'v')])
        params['blocks'].append({
            'ln1': {'scale': _t(state_dict[pre + 'layer_norm1.weight']),
                    'bias': _t(state_dict[pre + 'layer_norm1.bias'])},
            'ln2': {'scale': _t(state_dict[pre + 'layer_norm2.weight']),
                    'bias': _t(state_dict[pre + 'layer_norm2.bias'])},
            'qkv': {'w': qkv_w, 'b': qkv_b},
            'proj': {'w': _t(state_dict[pre + 'self_attn.out_proj.weight']).T,
                     'b': _t(state_dict[pre + 'self_attn.out_proj.bias'])},
            'fc1': {'w': _t(state_dict[pre + 'mlp.fc1.weight']).T,
                    'b': _t(state_dict[pre + 'mlp.fc1.bias'])},
            'fc2': {'w': _t(state_dict[pre + 'mlp.fc2.weight']).T,
                    'b': _t(state_dict[pre + 'mlp.fc2.bias'])},
        })
    return params, config


# -- forward ------------------------------------------------------------------


def _layer_norm(x, p, eps=1e-5):
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps) * p['scale'] + p['bias']


def _dense(x, p):
    return x @ p['w'] + p['b']


def _quick_gelu(x):
    """CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def _causal_attention(x, block, config):
    b, n, w = x.shape
    qkv = _dense(x, block['qkv']).reshape(b, n, 3, config.heads,
                                          config.head_dim)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b, n, h, d)
    logits = jnp.einsum('bnhd,bmhd->bhnm', q, k) / config.head_dim ** 0.5
    mask = jnp.tril(jnp.ones((n, n), bool))
    logits = jnp.where(mask[None, None], logits, -jnp.inf)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum('bhnm,bmhd->bnhd', weights, v).reshape(b, n, w)
    return _dense(out, block['proj'])


def encode_tokens(params, tokens, config=CLIP_VIT_B):
    """tokens: (B, context) int32 ids (zero-padded after <|endoftext|>)
    -> (B, embed_dim) UNNORMALIZED text embeddings (CLIP.encode_text
    semantics: features taken at the EOT position = per-row argmax id,
    layer-normed, projected)."""
    tokens = jnp.asarray(tokens, jnp.int32)
    n = tokens.shape[1]
    x = params['token_embedding'][tokens] + params['pos_embed'][:n]
    for block in params['blocks']:
        x = x + _causal_attention(_layer_norm(x, block['ln1']), block,
                                  config)
        h = _dense(_layer_norm(x, block['ln2']), block['fc1'])
        x = x + _dense(_quick_gelu(h), block['fc2'])
    x = _layer_norm(x, params['ln_final'])
    eot = jnp.argmax(tokens, axis=-1)
    pooled = x[jnp.arange(x.shape[0]), eot]
    return pooled @ params['text_projection']


# -- tokenizer ----------------------------------------------------------------


def _bytes_to_unicode():
    """GPT-2 byte <-> printable-unicode table (the BPE works on these)."""
    bs = (list(range(ord('!'), ord('~') + 1)) +
          list(range(ord('\xa1'), ord('\xac') + 1)) +
          list(range(ord('\xae'), ord('\xff') + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


try:
    # CLIP's tokenizer splits on unicode letter/number classes; the stdlib
    # re module has no \p{L}/\p{N}, so non-ASCII prompts would tokenize
    # differently from the reference clip.tokenize. Use the `regex`
    # module when present (it is in this environment), fall back to the
    # ASCII approximation otherwise (English prompts only).
    import regex as _regex
    _WORD_PAT = _regex.compile(
        r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
        r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+", _regex.IGNORECASE)
except ImportError:  # pragma: no cover - regex is a baked-in dependency
    _WORD_PAT = re.compile(
        r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
        r"|[a-z]+|[0-9]|[^\sa-z0-9]+", re.IGNORECASE)


class SimpleTokenizer:
    """CLIP's lowercased byte-pair tokenizer.

    bpe_path: the standard `bpe_simple_vocab_16e6.txt.gz` merges file
    (or an uncompressed/shortened file of the same format: one header
    line, then one space-separated merge pair per line). Vocabulary =
    256 byte symbols + their '</w>' forms + one token per merge +
    <|startoftext|>/<|endoftext|>.
    """

    MAX_MERGES = 49152 - 256 - 2

    def __init__(self, bpe_path):
        opener = gzip.open if bpe_path.endswith('.gz') else open
        with opener(bpe_path, 'rt', encoding='utf-8') as f:
            lines = f.read().split('\n')
        merges = [tuple(line.split()) for line in
                  lines[1:self.MAX_MERGES + 1] if len(line.split()) == 2]
        self.byte_encoder = _bytes_to_unicode()
        vocab = list(self.byte_encoder.values())
        vocab += [v + '</w>' for v in vocab]
        vocab += [''.join(merge) for merge in merges]
        vocab += ['<|startoftext|>', '<|endoftext|>']
        self.encoder = {token: i for i, token in enumerate(vocab)}
        self.bpe_ranks = {merge: i for i, merge in enumerate(merges)}
        self.sot = self.encoder['<|startoftext|>']
        self.eot = self.encoder['<|endoftext|>']
        self._cache = {}

    def _bpe(self, token):
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + '</w>',)
        while len(word) > 1:
            pairs = set(zip(word[:-1], word[1:]))
            best = min(pairs,
                       key=lambda p: self.bpe_ranks.get(p, float('inf')))
            if best not in self.bpe_ranks:
                break
            first, second = best
            merged = []
            i = 0
            while i < len(word):
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = tuple(merged)
        self._cache[token] = word
        return word

    def encode(self, text):
        """One string -> list of BPE ids (no SOT/EOT)."""
        text = html.unescape(html.unescape(text))
        text = re.sub(r'\s+', ' ', text).strip().lower()
        ids = []
        for token in _WORD_PAT.findall(text):
            token = ''.join(self.byte_encoder[b]
                            for b in token.encode('utf-8'))
            ids.extend(self.encoder[t] for t in self._bpe(token))
        return ids

    def tokenize(self, texts, context_length=77):
        """list of strings -> (N, context_length) int32, zero-padded,
        <|startoftext|> ... <|endoftext|> framing (clip.tokenize
        semantics, truncating overlong prompts)."""
        out = np.zeros((len(texts), context_length), np.int32)
        for i, text in enumerate(texts):
            ids = [self.sot] + self.encode(text)[:context_length - 2] + \
                [self.eot]
            out[i, :len(ids)] = ids
        return out


class CLIPTextEncoder:
    """Prompt -> unit-norm embedding, from local checkpoint files.

    weights: OpenAI clip checkpoint (.pt TorchScript archive or a plain
    state dict) or an HF CLIP state dict; bpe: the merges file. Used by
    features/lseg.py when AUTOLABEL_CLIP_WEIGHTS / AUTOLABEL_CLIP_BPE
    are set.
    """

    def __init__(self, weights, bpe):
        import torch
        try:
            model = torch.jit.load(weights, map_location='cpu')
            state = model.state_dict()
        except Exception:
            state = torch.load(weights, map_location='cpu')
            state = state.get('state_dict', state)
        state = {k: v for k, v in state.items()
                 if not k.startswith('visual.')}
        if any(k.startswith('text_model.') for k in state):
            self.params, self.config = load_hf_state_dict(state)
        else:
            self.params, self.config = load_openai_state_dict(state)
        self.tokenizer = SimpleTokenizer(bpe)
        self._encode = jax.jit(
            lambda p, t: encode_tokens(p, t, self.config))

    def encode_text(self, prompts):
        """list of N strings -> unit-norm (N, embed_dim) float32."""
        tokens = self.tokenizer.tokenize(
            list(prompts), self.config.context_length)
        if tokens.max() >= self.config.vocab_size:
            # jnp indexing clamps silently — fail loudly instead.
            raise ValueError(
                f"tokenizer produced id {int(tokens.max())} outside the "
                f"checkpoint's vocab ({self.config.vocab_size}); the BPE "
                "file and weights are mismatched.")
        features = np.asarray(self._encode(self.params, tokens))
        return features / np.linalg.norm(features, axis=-1, keepdims=True)


def from_env():
    """CLIPTextEncoder from AUTOLABEL_CLIP_WEIGHTS + AUTOLABEL_CLIP_BPE,
    or None if either is unset/missing."""
    weights = os.environ.get('AUTOLABEL_CLIP_WEIGHTS')
    bpe = os.environ.get('AUTOLABEL_CLIP_BPE')
    if weights and bpe and os.path.exists(weights) and os.path.exists(bpe):
        return CLIPTextEncoder(weights, bpe)
    return None
