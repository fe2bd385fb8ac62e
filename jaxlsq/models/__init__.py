from .calibrate import calibrate, enable_param_learning_all, set_static_estimate
from .layers import (FakeQuantize, QuantConv, QuantDense, QuantDenseGeneral,
                     QuantEmbed)
from .moe import QuantMoE, load_balance_loss
from .qconfig import QConfig, default_qconfig
from .quantize import QuantizedModel, quantize_model
from .toggles import (
    disable_fake_quant,
    disable_fake_quant_on_act,
    disable_observer,
    disable_observer_on_weights,
    enable_fake_quant,
    enable_fake_quant_on_act,
    enable_observer,
    enable_observer_on_weights,
    map_quant_state,
)
from .zoo import (BasicBlock, QuantCNN, QuantMLP, QuantMobileNetV2,
                  QuantResNet, QuantTransformerBlock, QuantTransformerLM,
                  mobilenetv2_cifar, resnet18_cifar)

__all__ = [
    "FakeQuantize", "QuantConv", "QuantDense", "QuantDenseGeneral",
    "QuantEmbed",
    "QuantMoE", "load_balance_loss",
    "QConfig", "default_qconfig",
    "quantize_model", "QuantizedModel",
    "calibrate", "set_static_estimate", "enable_param_learning_all",
    "enable_fake_quant", "disable_fake_quant",
    "enable_observer", "disable_observer",
    "enable_fake_quant_on_act", "disable_fake_quant_on_act",
    "enable_observer_on_weights", "disable_observer_on_weights",
    "map_quant_state",
    "QuantMLP", "QuantCNN", "QuantResNet", "BasicBlock", "resnet18_cifar",
    "QuantMobileNetV2", "mobilenetv2_cifar",
    "QuantTransformerBlock", "QuantTransformerLM",
]
