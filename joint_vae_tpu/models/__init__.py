"""Model modules: conv-string DSL, encoder/decoder/classifier, and the CVNet core."""

from .conv import parse_conv_layer_name, conv_stack_plan, ConvStack, find_input_shape  # noqa: F401
from .cvnet import CVNet, CVNetConfig  # noqa: F401
