"""Timestamp-matching buffers for the online ROS node.

The reference imports autolabel.utils.ros_utils (scripts/ros/node.py:17,23)
but never ships it — a latent bug noted in SURVEY.md. This implements the
inferred contract: a bounded message buffer matching rgb/depth/keyframe
streams by closest header timestamp within a sync threshold. Pure Python:
testable without ROS (any object with .header.stamp.to_sec()).
"""
from collections import deque


class MessageBuffer:
    """Keep the last max_size messages; answer closest-in-time queries."""

    def __init__(self, sync_threshold, max_size=10):
        self.sync_threshold = sync_threshold
        self.messages = deque(maxlen=max_size)

    def add_message(self, msg):
        self.messages.append(msg)

    def closest(self, stamp):
        """The buffered message closest to `stamp` within the threshold,
        or None."""
        target = stamp.to_sec()
        best = None
        best_dt = self.sync_threshold
        for msg in self.messages:
            dt = abs(msg.header.stamp.to_sec() - target)
            if dt <= best_dt:
                best = msg
                best_dt = dt
        return best

    def __len__(self):
        return len(self.messages)
