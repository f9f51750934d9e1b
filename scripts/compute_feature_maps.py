"""Offline teacher-feature extraction -> <scene>/features.hdf.

Writes float16 lzf-compressed feature maps under features/<name>, with a
pickled PCA(3) + min/range stored in the dataset attrs (the visualization
contract every consumer relies on, reference compute_feature_maps.py:
106-118). --autoencode trains the 64-d bottleneck autoencoder (JAX/optax
replaces the torch training loop).

CLI parity: reference scripts/compute_feature_maps.py.
"""
import argparse
import math
import os
import pickle
import sys

import cv2
import h5py
import numpy as np
from PIL import Image
from sklearn import decomposition
from tqdm import tqdm

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from autolabel_tpu.features.feature_utils import get_feature_extractor
from autolabel_tpu.models.autoencoder import Autoencoder
from autolabel_tpu.utils import Scene


def read_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('scene')
    parser.add_argument('--vis', action='store_true')
    parser.add_argument('--video',
                        type=str,
                        help="Create video of maps and write to this path.")
    parser.add_argument('--features',
                        type=str,
                        choices=['fcn50', 'dino', 'lseg', 'demo'])
    parser.add_argument('--checkpoint',
                        type=str,
                        help="Which model weights to use.")
    parser.add_argument('--dim', type=int, default=64)
    parser.add_argument('--autoencode', action='store_true')
    parser.add_argument('--allow-fallback', action='store_true',
                        help="Permit deterministic stand-in features "
                        "when real teacher weights are unavailable "
                        "(testing only).")
    return parser.parse_args()


def compress_features(features, dim, epochs=5, batch_size=2048, lr=1e-3):
    """Train the bottleneck autoencoder (MSE + 0.01 L1 code sparsity) and
    return the encoded maps. Parity: compute_feature_maps.py:36-62."""
    import jax
    import jax.numpy as jnp
    import optax

    features = np.stack(features)
    N, H, W, C = features.shape
    data = features.reshape(N * H * W, C).astype(np.float32)

    coder = Autoencoder(C, dim)
    params = coder.init(jax.random.PRNGKey(0))
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch, key):
        def loss_fn(p):
            reconstructed, code = coder.apply(p, batch, key=key)
            return (jnp.mean((reconstructed - batch) ** 2) +
                    0.01 * jnp.mean(jnp.abs(code)))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(1)
    rng = np.random.default_rng(0)
    n_batches = math.ceil(len(data) / batch_size)
    for epoch in range(epochs):
        order = rng.permutation(len(data))
        bar = tqdm(range(n_batches), desc=f"Autoencoder epoch {epoch}")
        for b in bar:
            idx = order[b * batch_size:(b + 1) * batch_size]
            if len(idx) < batch_size:  # keep shapes static for jit
                idx = np.concatenate(
                    [idx, order[:batch_size - len(idx)]])
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, data[idx], sub)

    encode = jax.jit(coder.encode)
    out = np.zeros((N, H, W, dim), dtype=np.float16)
    for i in range(N):
        code = encode(params, features[i].reshape(H * W, C).astype(
            np.float32))
        out[i] = np.asarray(code, dtype=np.float16).reshape(H, W, dim)
    return out


def compute_size(image_path, feature):
    image = np.array(Image.open(image_path))
    H, W = image.shape[:2]
    short_side = min(H, W)
    # lseg/demo produce 512-d half-res maps: full 720-px inputs
    # would make the hdf5 enormous for no teacher benefit.
    target_size = 242 if feature in ('lseg', 'demo') else 720
    scale_factor = target_size / short_side
    return int(H * scale_factor), int(W * scale_factor)


def extract_features(extractor, scene, output_file, flags):
    paths = scene.rgb_paths()
    H, W = compute_size(paths[0], flags.features)
    shape = extractor.shape((H, W))
    dataset = output_file.create_dataset(flags.features,
                                         (len(paths), *shape, flags.dim),
                                         dtype=np.float16,
                                         compression='lzf')
    extracted = []
    batch_size = 2
    for i in tqdm(range(math.ceil(len(paths) / batch_size))):
        index = slice(i * batch_size, (i + 1) * batch_size)
        images = []
        for p in paths[index]:
            image = np.array(Image.open(p), dtype=np.float32)[..., :3]
            image = cv2.resize(image, (W, H),
                               interpolation=cv2.INTER_LINEAR) / 255.0
            images.append(image.transpose(2, 0, 1))
        features = np.asarray(extractor(np.stack(images)))
        if flags.autoencode:
            extracted += [f for f in features]
        else:
            dataset[index] = features[..., :flags.dim]

    if flags.autoencode:
        dataset[:] = compress_features(extracted, flags.dim)

    N, H, W, C = dataset.shape
    X = dataset[:].reshape(N * H * W, C)
    pca = decomposition.PCA(n_components=3)
    indices = np.random.randint(0, X.shape[0], size=50000)
    transformed = pca.fit_transform(X[indices])
    minimum = transformed.min(axis=0)
    maximum = transformed.max(axis=0)
    dataset.attrs['pca'] = np.void(pickle.dumps(pca))
    dataset.attrs['min'] = minimum
    dataset.attrs['range'] = maximum - minimum


def visualize_features(features):
    from matplotlib import pyplot
    pca = pickle.loads(features.attrs['pca'].tobytes())
    N, H, W, C = features.shape
    for fm in features[::10]:
        mapped = pca.transform(fm.reshape(H * W, C)).reshape(H, W, 3)
        normalized = np.clip(
            (mapped - features.attrs['min']) / features.attrs['range'], 0, 1)
        pyplot.imshow(normalized)
        pyplot.show()


def write_video(features, out):
    pca = pickle.loads(features.attrs['pca'].tobytes())
    N, H, W, C = features.shape
    writer = cv2.VideoWriter(out, cv2.VideoWriter_fourcc(*'mp4v'), 5, (W, H))
    for feature in tqdm(features, desc="Encoding frames"):
        mapped = pca.transform(feature.reshape(H * W, C)).reshape(H, W, 3)
        normalized = np.clip(
            (mapped - features.attrs['min']) / features.attrs['range'], 0, 1)
        frame = (normalized * 255.0).astype(np.uint8)
        writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    writer.release()


def main():
    flags = read_args()
    np.random.seed(0)

    scene = Scene(flags.scene)
    with h5py.File(os.path.join(scene.path, 'features.hdf'), 'w',
                   libver='latest') as output_file:
        group = output_file.create_group('features')
        extractor = get_feature_extractor(
            flags.features, flags.checkpoint,
            allow_fallback=flags.allow_fallback)
        extract_features(extractor, scene, group, flags)
        if flags.vis:
            visualize_features(group[flags.features])
        if flags.video:
            write_video(group[flags.features], flags.video)


if __name__ == "__main__":
    main()
