"""Text-prompt class editor for the online (ROS) open-vocab node.

Behavior contract (reference /root/reference/scripts/ros/class_input.py):
a small window maintaining an ordered list of natural-language class
prompts, publishing the '|'-joined list on /autolabel/segmentation_classes
whenever it changes; row colors match the segmentation palette; the first
entry is always the background prompt; Esc closes.

Rebuilt around a model/view split: PromptList is a plain-python state
object (testable without Qt or ROS), the window renders it with a
QListWidget, and publishing goes through a ROS-agnostic callback.
"""
import os
import sys

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))

from autolabel_tpu.constants import COLORS

TOPIC = '/autolabel/segmentation_classes'
BACKGROUND_PROMPT = 'background; other'


class PromptList:
    """Ordered class prompts; index 0 is the background prompt."""

    def __init__(self, on_change=None):
        self._prompts = [BACKGROUND_PROMPT]
        self._on_change = on_change or (lambda encoded: None)

    @property
    def prompts(self):
        return list(self._prompts)

    def encoded(self):
        return '|'.join(self._prompts)

    def add(self, prompt):
        prompt = prompt.strip()
        if not prompt:
            return False
        self._prompts.append(prompt)
        self._on_change(self.encoded())
        return True

    def reset(self):
        self._prompts = [BACKGROUND_PROMPT]
        self._on_change(self.encoded())

    def color(self, index):
        return tuple(int(c) for c in COLORS[index % len(COLORS)])


def main():
    import rospy
    from PyQt6 import QtCore, QtGui, QtWidgets
    from std_msgs.msg import String

    rospy.init_node('segmentation_prompt_gui')
    publisher = rospy.Publisher(TOPIC, String, queue_size=1)

    app = QtWidgets.QApplication(sys.argv)

    window = QtWidgets.QWidget()
    window.setWindowTitle('Open-vocab classes')
    prompts = PromptList(
        on_change=lambda encoded: publisher.publish(String(encoded)))

    list_widget = QtWidgets.QListWidget()
    entry = QtWidgets.QLineEdit()
    entry.setPlaceholderText('Describe a class to segment…')
    add_button = QtWidgets.QPushButton('Add')
    reset_button = QtWidgets.QPushButton('Reset')

    def refresh():
        list_widget.clear()
        for i, prompt in enumerate(prompts.prompts):
            item = QtWidgets.QListWidgetItem(prompt)
            r, g, b = prompts.color(i)
            item.setBackground(QtGui.QColor(r, g, b))
            list_widget.addItem(item)

    def add_prompt():
        if prompts.add(entry.text()):
            entry.clear()
            refresh()

    def reset_prompts():
        prompts.reset()
        refresh()

    add_button.clicked.connect(add_prompt)
    entry.returnPressed.connect(add_prompt)
    reset_button.clicked.connect(reset_prompts)

    buttons = QtWidgets.QHBoxLayout()
    buttons.addWidget(entry)
    buttons.addWidget(add_button)
    buttons.addWidget(reset_button)
    layout = QtWidgets.QVBoxLayout(window)
    layout.addWidget(list_widget)
    layout.addLayout(buttons)

    shortcut = QtGui.QShortcut(QtGui.QKeySequence(
        QtCore.Qt.Key.Key_Escape), window)
    shortcut.activated.connect(window.close)

    refresh()
    prompts.reset()  # publish the initial class list once at startup
    window.show()
    app.exec()


if __name__ == '__main__':
    main()
