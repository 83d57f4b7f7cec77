# Mask2Former (Cheng et al., CVPR 2022) on ResNet-50: masked-attention
# mask transformer — 9 decoder layers cycling over the three coarsest
# pixel-decoder scales, cross-attention restricted to each query's
# previous foreground prediction, learned query features, deep
# supervision on every layer (incl. the pre-decoder prediction).
# Matching + losses shared with MaskFormer (on-device auction matcher),
# with the upstream Mask2Former arrangement: sigmoid-BCE mask loss
# (cls 2.0 / mask 5.0 / dice 5.0) computed on 12544 importance-sampled
# points per pair against the full-resolution targets.
# Beyond-reference family; the remaining divergence from the mmseg
# arrangement (FPN pixel decoder in place of MSDeformAttn) is
# documented in the head module.
norm_cfg = dict(type='SyncBatchNorm', requires_grad=True)
model = dict(
    type='EncoderDecoder',
    backbone=dict(type='ResNetV1c', depth=50, num_stages=4,
                  out_indices=(0, 1, 2, 3), dilations=(1, 1, 1, 1),
                  strides=(1, 2, 2, 2), norm_cfg=norm_cfg),
    decode_head=dict(type='Mask2FormerHead',
                     in_channels=[256, 512, 1024, 2048],
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
