"""JAX CLIP text encoder vs transformers, with SHARED random weights —
proves the forward + weight import are correct so that supplying the real
OpenAI checkpoint (AUTOLABEL_CLIP_WEIGHTS) yields real CLIP embeddings.
Plus BPE tokenizer machinery tests on a synthetic merges file."""
import gzip

import numpy as np
import pytest

from autolabel_tpu.features import clip_text_jax


def _small_hf_model(vocab_size=99):
    transformers = pytest.importorskip('transformers')
    config = transformers.CLIPTextConfig(
        vocab_size=vocab_size,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=16,
        projection_dim=24,
        eos_token_id=vocab_size - 1,
        hidden_act='quick_gelu')
    model = transformers.CLIPTextModelWithProjection(config)
    model.eval()
    return model, config


def _tokens(config, batch=3, seq=11, seed=0):
    """Random ids with a single EOT (= the max vocab id) per row, zero
    padding after — the layout where OpenAI argmax pooling and HF
    eos-position pooling agree."""
    rng = np.random.default_rng(seed)
    tokens = np.zeros((batch, seq), np.int32)
    for i in range(batch):
        n = int(rng.integers(3, seq - 1))
        tokens[i, :n] = rng.integers(1, 90, n)
        tokens[i, n] = config.eos_token_id
    return tokens


@pytest.mark.slow
def test_matches_transformers_clip_text():
    torch = pytest.importorskip('torch')
    model, config = _small_hf_model()
    tokens = _tokens(config)

    with torch.inference_mode():
        ref = model(input_ids=torch.as_tensor(
            tokens, dtype=torch.long)).text_embeds.numpy()

    jcfg = clip_text_jax.CLIPTextConfig(
        vocab_size=99, width=32, depth=2, heads=4, context_length=16,
        embed_dim=24)
    params, jcfg = clip_text_jax.load_hf_state_dict(
        {k: v for k, v in model.state_dict().items()}, config=jcfg)
    assert jcfg.depth == 2 and jcfg.width == 32 and jcfg.embed_dim == 24
    out = np.asarray(clip_text_jax.encode_tokens(params, tokens, jcfg))

    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-4)


@pytest.mark.slow
def test_openai_and_hf_loaders_agree():
    """The same weights expressed in OpenAI naming load to the same
    pytree the HF loader produces."""
    torch = pytest.importorskip('torch')
    model, config = _small_hf_model()
    hf_state = model.state_dict()
    jcfg = clip_text_jax.CLIPTextConfig(
        vocab_size=99, width=32, depth=2, heads=4, context_length=16,
        embed_dim=24)
    params_hf, jcfg = clip_text_jax.load_hf_state_dict(dict(hf_state),
                                                       config=jcfg)

    openai = {
        'token_embedding.weight':
            hf_state['text_model.embeddings.token_embedding.weight'],
        'positional_embedding':
            hf_state['text_model.embeddings.position_embedding.weight'],
        'ln_final.weight': hf_state['text_model.final_layer_norm.weight'],
        'ln_final.bias': hf_state['text_model.final_layer_norm.bias'],
        'text_projection': hf_state['text_projection.weight'].T,
        # visual.* keys must be ignored:
        'visual.conv1.weight': torch.zeros(2, 2),
    }
    for i in range(jcfg.depth):
        src = f'text_model.encoder.layers.{i}.'
        dst = f'transformer.resblocks.{i}.'
        openai[dst + 'ln_1.weight'] = hf_state[src + 'layer_norm1.weight']
        openai[dst + 'ln_1.bias'] = hf_state[src + 'layer_norm1.bias']
        openai[dst + 'ln_2.weight'] = hf_state[src + 'layer_norm2.weight']
        openai[dst + 'ln_2.bias'] = hf_state[src + 'layer_norm2.bias']
        openai[dst + 'attn.in_proj_weight'] = torch.cat(
            [hf_state[src + f'self_attn.{k}_proj.weight']
             for k in ('q', 'k', 'v')])
        openai[dst + 'attn.in_proj_bias'] = torch.cat(
            [hf_state[src + f'self_attn.{k}_proj.bias']
             for k in ('q', 'k', 'v')])
        openai[dst + 'attn.out_proj.weight'] = \
            hf_state[src + 'self_attn.out_proj.weight']
        openai[dst + 'attn.out_proj.bias'] = \
            hf_state[src + 'self_attn.out_proj.bias']
        openai[dst + 'mlp.c_fc.weight'] = hf_state[src + 'mlp.fc1.weight']
        openai[dst + 'mlp.c_fc.bias'] = hf_state[src + 'mlp.fc1.bias']
        openai[dst + 'mlp.c_proj.weight'] = hf_state[src + 'mlp.fc2.weight']
        openai[dst + 'mlp.c_proj.bias'] = hf_state[src + 'mlp.fc2.bias']

    params_oai, ocfg = clip_text_jax.load_openai_state_dict(openai,
                                                            config=jcfg)
    assert ocfg.depth == jcfg.depth and ocfg.embed_dim == jcfg.embed_dim

    tokens = _tokens(config)
    a = np.asarray(clip_text_jax.encode_tokens(params_hf, tokens, jcfg))
    b = np.asarray(clip_text_jax.encode_tokens(params_oai, tokens, ocfg))
    np.testing.assert_allclose(a, b, atol=1e-6)


def _merges_file(tmp_path, compress=True):
    """Tiny merges file in the bpe_simple_vocab_16e6 format: header line
    then one merge pair per line."""
    lines = [
        'bpe test vocab v0',
        't h',
        'th e</w>',
        'c a',
        'ca t</w>',
        'r e',
        'd o',
        'do g</w>',
    ]
    content = '\n'.join(lines) + '\n'
    if compress:
        path = tmp_path / 'bpe.txt.gz'
        with gzip.open(path, 'wt', encoding='utf-8') as f:
            f.write(content)
    else:
        path = tmp_path / 'bpe.txt'
        path.write_text(content)
    return str(path)


def test_tokenizer_applies_merges(tmp_path):
    tok = clip_text_jax.SimpleTokenizer(_merges_file(tmp_path))
    # 'the' -> t+h -> th, then th+e</w> -> 'the</w>': one token.
    assert tok.encode('The') == [tok.encoder['the</w>']]
    assert tok.encode('cat') == [tok.encoder['cat</w>']]
    # 'red' has merge r+e but 'd</w>' stays separate -> two tokens.
    assert tok.encode('red') == [tok.encoder['re'], tok.encoder['d</w>']]
    # Unmerged word falls back to byte symbols with trailing </w>.
    assert tok.encode('ox') == [tok.encoder['o'], tok.encoder['x</w>']]
    # Case-insensitive, multi-word, punctuation split.
    ids = tok.encode('The cat, the dog!')
    assert tok.encoder['the</w>'] in ids and tok.encoder['cat</w>'] in ids


def test_tokenize_framing(tmp_path):
    tok = clip_text_jax.SimpleTokenizer(_merges_file(tmp_path,
                                                     compress=False))
    out = tok.tokenize(['the cat', 'dog'], context_length=8)
    assert out.shape == (2, 8) and out.dtype == np.int32
    assert out[0, 0] == tok.sot and out[1, 0] == tok.sot
    row0 = list(out[0])
    assert tok.eot in row0
    assert row0[row0.index(tok.eot) + 1:] == [0] * (
        7 - row0.index(tok.eot))
    # EOT is the largest id in the vocab => argmax pooling finds it.
    assert out.max() == tok.eot


def test_lseg_uses_jax_clip_from_env(tmp_path, monkeypatch):
    """LSegFE picks up AUTOLABEL_CLIP_WEIGHTS/BPE: real text-encoder path
    (no --allow-fallback needed), unit-norm deterministic embeddings."""
    torch = pytest.importorskip('torch')
    # Vocab must cover the synthetic tokenizer's id space (256 bytes +
    # 256 '</w>' forms + 7 merges + 2 specials = 521 ids).
    model, _ = _small_hf_model(vocab_size=521)
    ckpt = tmp_path / 'clip.pth'
    torch.save(model.state_dict(), ckpt)
    monkeypatch.setenv('AUTOLABEL_CLIP_WEIGHTS', str(ckpt))
    monkeypatch.setenv('AUTOLABEL_CLIP_BPE', _merges_file(tmp_path))

    from autolabel_tpu.features.lseg import LSegFE
    fe = LSegFE(allow_fallback=False)  # must not raise: real text tower
    assert fe._jax_clip is not None
    emb = fe.encode_text(['the cat', 'a dog', 'red box'])
    assert emb.shape == (3, 24)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0,
                               atol=1e-5)
    emb2 = fe.encode_text(['the cat', 'a dog', 'red box'])
    np.testing.assert_allclose(emb, emb2, atol=0)
    # Different prompts embed differently.
    assert np.abs(emb[0] - emb[1]).max() > 1e-4
    # The env-var CLIP satisfies only the TEXT side: PIXEL feature
    # extraction must still refuse without the explicit opt-in (matching
    # real text embeddings against random pixel features is meaningless).
    with pytest.raises(RuntimeError, match='allow-fallback'):
        fe(np.zeros((1, 3, 16, 16), np.float32))
    fe2 = LSegFE(allow_fallback=True)
    assert fe2._jax_clip is not None
    assert fe2(np.zeros((1, 3, 16, 16), np.float32)).shape == (1, 8, 8, 512)
