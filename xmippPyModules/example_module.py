"""Example importable module (reference py_xmipp/example_module.py role):
demonstrates that user code can `import xmippPyModules...` and reach the
framework."""


def axis_angle_example():
    return "xmippPyModules is importable"
