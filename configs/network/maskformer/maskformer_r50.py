# MaskFormer (Cheng et al., NeurIPS 2021) on ResNet-50: mask
# classification — 100 learned queries each predict a (class, mask)
# pair through a 6-layer DETR decoder over the C5 memory; an FPN-style
# pixel decoder supplies 1/4 mask features; training matches queries to
# the present classes with the on-device auction algorithm
# (ops/matching.py) and the upstream CE(0.1 no-object) + 20*focal +
# dice losses.  Beyond-reference family; softmax semantics (mask
# classification has no binary 1-channel mode).
norm_cfg = dict(type='SyncBatchNorm', requires_grad=True)
model = dict(
    type='EncoderDecoder',
    backbone=dict(type='ResNetV1c', depth=50, num_stages=4,
                  out_indices=(0, 1, 2, 3), dilations=(1, 1, 1, 1),
                  strides=(1, 2, 2, 2), norm_cfg=norm_cfg),
    decode_head=dict(type='MaskFormerHead',
                     in_channels=[256, 512, 1024, 2048],
                     in_index=(0, 1, 2, 3),
                     input_transform='multiple_select',
                     channels=256, feat_channels=256,
                     num_queries=100, num_decoder_layers=6, num_heads=8,
                     feedforward_channels=2048,
                     dropout_ratio=0.0, num_classes=2,
                     align_corners=False),
    train_cfg=dict(), test_cfg=dict(mode='whole'))
