# K-Net S3 (Zhang et al., NeurIPS 2021) over UPerNet-R50: the UPerHead
# generates stage-0 masks and donates its classifier weights as the
# initial class kernels; three KernelUpdateHead stages refine kernels
# against mask-pooled group features (gated adaptive update + kernel
# self-attention + dynamic 1x1 conv).  Deep supervision on every stage.
# Beyond-reference family; softmax CE (K-Net refines one kernel per
# class, so the binary sigmoid contract does not apply).
norm_cfg = dict(type='SyncBatchNorm', requires_grad=True)
model = dict(
    type='EncoderDecoder',
    backbone=dict(type='ResNetV1c', depth=50, num_stages=4,
                  out_indices=(0, 1, 2, 3), dilations=(1, 1, 1, 1),
                  strides=(1, 2, 2, 2), norm_cfg=norm_cfg),
    decode_head=dict(
        type='IterativeDecodeHead',
        num_stages=3,
        num_classes=2,
        align_corners=False,
        kernel_generate_head=dict(type='UPerHead',
                                  in_channels=[256, 512, 1024, 2048],
                                  in_index=(0, 1, 2, 3),
                                  input_transform='multiple_select',
                                  pool_scales=(1, 2, 3, 6), channels=512,
                                  dropout_ratio=0.1, num_classes=2,
                                  norm_cfg=norm_cfg, align_corners=False),
        kernel_update_head=dict(num_heads=8, num_mask_fcs=1,
                                feedforward_channels=2048),
        loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                         loss_weight=1.0)),
    auxiliary_head=dict(type='FCNHead', in_channels=1024, in_index=2,
                        channels=256, num_convs=1, concat_input=False,
                        dropout_ratio=0.1, num_classes=2,
                        norm_cfg=norm_cfg, align_corners=False,
                        loss_decode=dict(type='CrossEntropyLoss',
                                         use_sigmoid=True, loss_weight=0.4)),
    train_cfg=dict(), test_cfg=dict(mode='whole'))
