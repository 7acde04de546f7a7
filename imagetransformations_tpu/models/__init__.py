from imagetransformations_tpu.models.resnet import (  # noqa: F401
    CifarResNet,
    resnet20,
    resnet56,
    load_torch_state_dict,
)
from imagetransformations_tpu.models.simple_cnn import SimpleCNN  # noqa: F401
from imagetransformations_tpu.models.bayesian import BayesianCNN  # noqa: F401
from imagetransformations_tpu.models.imagenet import (  # noqa: F401
    ResNet50,
    VGG19BN,
    ResNet18,
    load_resnet50_torch_state_dict,
    load_resnet_torch_state_dict,
    load_vgg19_bn_torch_state_dict,
    normalize_imagenet,
)
