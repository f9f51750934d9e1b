"""Class-balanced pixel index sampling over sparse user annotations.

Semantic label convention (kept from the reference, dataset.py:96-126):
0 is the null/unlabeled class, 1 is background, 2+ are object classes.

Parity: autolabel/dataset.py:80-151 (IndexSampler), including behavior
covered by the reference's unit tests (test/test_sampling.py).
"""
import numpy as np


class IndexSampler:
    """Index of labeled pixels: class id -> image index -> flat pixel ids."""

    def __init__(self):
        self.classes = np.array([])
        self.index = {}
        # class id -> per-image probability of sampling that image,
        # proportional to its pixel count for the class.
        self.image_weights = {}
        self.has_semantics = False
        self.image_range = np.array([])

    def update(self, semantic_maps):
        """Recompute the index from (n_images, n_pixels) label maps."""
        assert semantic_maps.ndim == 2
        self.index = {}
        classes = np.unique(semantic_maps)
        self.classes = classes[classes != 0]
        n_images = len(semantic_maps)
        counts = {}
        for class_id in self.classes:
            per_image = {}
            class_counts = np.zeros(n_images)
            for i in range(n_images):
                where = np.flatnonzero(semantic_maps[i] == class_id)
                if where.size:
                    self.has_semantics = True
                    per_image[i] = where
                    class_counts[i] = where.size
            if per_image:
                self.index[class_id] = per_image
                counts[class_id] = class_counts / class_counts.sum()
        self.image_weights = counts
        self.image_range = np.arange(n_images, dtype=int)

    def sample_class(self):
        return np.random.choice(self.classes)

    def sample(self, class_id, count=1):
        """Sample an image (weighted by class pixel count) and pixel ids.

        Returns (image_index, (count,) pixel indices of class_id pixels).
        """
        images = self.index[class_id]
        probabilities = self.image_weights[class_id]
        image_index = np.random.choice(self.image_range, p=probabilities)
        pixel_indices = np.random.choice(images[image_index], count)
        return image_index, pixel_indices

    def semantic_indices(self):
        """Sorted image indices that carry any semantic annotation."""
        indices = set()
        for per_image in self.index.values():
            indices.update(per_image.keys())
        return sorted(indices)
