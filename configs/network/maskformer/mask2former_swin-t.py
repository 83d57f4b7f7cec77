# Mask2Former on Swin-T — the upstream flagship pairing (Cheng et al.,
# CVPR 2022 report their headline semantic numbers on Swin backbones).
# Same head arrangement as mask2former_r50.py over the Swin pyramid.
norm_cfg = dict(type='SyncBatchNorm', requires_grad=True)
model = dict(
    type='EncoderDecoder',
    backbone=dict(type='SwinTransformer', arch='tiny', window_size=8,
                  out_indices=(0, 1, 2, 3), drop_path_rate=0.1),
    decode_head=dict(type='Mask2FormerHead',
                     in_channels=[96, 192, 384, 768],
                     in_index=(0, 1, 2, 3),
                     input_transform='multiple_select',
                     channels=256, feat_channels=256,
                     num_queries=100, num_decoder_layers=9, num_heads=8,
                     num_scales=3, feedforward_channels=2048,
                     cls_weight=2.0, mask_weight=5.0, dice_weight=5.0,
                     mask_loss_type='ce', num_points=12544,
                     oversample_ratio=3.0, importance_sample_ratio=0.75,
                     dropout_ratio=0.0, num_classes=2,
                     align_corners=False),
    train_cfg=dict(), test_cfg=dict(mode='whole'))
