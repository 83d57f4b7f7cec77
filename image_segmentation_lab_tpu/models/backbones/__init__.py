from .resnet import ResNet, ResNetV1c, ResNetV1d
