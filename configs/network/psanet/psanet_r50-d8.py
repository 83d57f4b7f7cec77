# PSANet (Zhao et al., ECCV 2018) with dilated ResNet-50-V1c (output
# stride 8).  Beyond-reference family, Kvasir binary convention.
# mask_size covers the full 640² feature grid after shrink (80/2=40 →
# any odd mask ≥ 79 is complete; mmseg's cityscapes config uses 97).
norm_cfg = dict(type='SyncBatchNorm', requires_grad=True)
model = dict(type='EncoderDecoder',
             backbone=dict(type='ResNetV1c', depth=50, num_stages=4,
                           out_indices=(0, 1, 2, 3), dilations=(1, 1, 2, 4),
                           strides=(1, 2, 1, 1), norm_cfg=norm_cfg,
                           contract_dilation=True),
             decode_head=dict(type='PSAHead', in_channels=2048, in_index=3,
                              channels=512, mask_size=(79, 79),
                              psa_type='bi-direction', compact=False,
                              shrink_factor=2, normalization_factor=1.0,
                              psa_softmax=True, dropout_ratio=0.1,
                              num_classes=2, norm_cfg=norm_cfg,
                              align_corners=False,
                              loss_decode=dict(type='CrossEntropyLoss',
                                               use_sigmoid=True,
                                               loss_weight=1.0)),
             auxiliary_head=dict(type='FCNHead', in_channels=1024, in_index=2,
                                 channels=256, num_convs=1, concat_input=False,
                                 dropout_ratio=0.1, num_classes=2,
                                 norm_cfg=norm_cfg, align_corners=False,
                                 loss_decode=dict(type='CrossEntropyLoss',
                                                  use_sigmoid=True,
                                                  loss_weight=0.4)),
             train_cfg=dict(), test_cfg=dict(mode='whole'))
