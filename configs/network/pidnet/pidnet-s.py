# PIDNet-S (Xu et al., CVPR 2023): three-branch realtime backbone (P
# detail / I context / D boundary) with PAPPM context pooling and
# LightBag boundary-guided fusion; PIDHead trains all three branches
# (CE on P, OHEM CE on the merged map, class-balanced boundary BCE on D,
# boundary-aware CE) and serves the merged map at eval.  Beyond-reference
# family, Kvasir binary convention.
norm_cfg = dict(type='SyncBatchNorm', requires_grad=True)
model = dict(
    type='EncoderDecoder',
    backbone=dict(type='PIDNet', channels=32, ppm_channels=96,
                  num_stem_blocks=2, num_branch_blocks=3,
                  norm_cfg=norm_cfg, align_corners=False),
    decode_head=dict(
        type='PIDHead', in_channels=128, channels=128,
        dropout_ratio=0.0, num_classes=2, norm_cfg=norm_cfg,
        align_corners=False, edge_width=4,
        loss_decode=[
            dict(type='CrossEntropyLoss', use_sigmoid=False,
                 loss_weight=0.4),
            dict(type='OhemCrossEntropy', thres=0.9, min_kept=131072,
                 loss_weight=1.0),
            dict(type='BoundaryLoss', loss_weight=20.0),
            dict(type='OhemCrossEntropy', thres=0.9, min_kept=131072,
                 loss_weight=1.0),
        ]),
    train_cfg=dict(), test_cfg=dict(mode='whole'))
