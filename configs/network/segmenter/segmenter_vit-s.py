# Segmenter (Strudel et al., ICCV 2021) with ViT-Small/16: mask
# transformer decoder — K class embeddings co-attend with the patch
# tokens and masks are L2-normalized token/class similarities.
# Beyond-reference family, adapted to this framework's binary Kvasir
# convention (num_classes=2, sigmoid CE).
norm_cfg = dict(type='SyncBatchNorm', requires_grad=True)
model = dict(type='EncoderDecoder',
             backbone=dict(type='VisionTransformer',
                           arch='small',
                           patch_size=16,
                           pretrain_img_size=224,
                           with_cls_token=True,
                           out_indices=(11,),
                           final_norm=True,
                           interpolate_mode='bicubic',
                           drop_rate=0.0,
                           attn_drop_rate=0.0,
                           drop_path_rate=0.1),
             decode_head=dict(type='SegmenterMaskTransformerHead',
                              in_channels=384,
                              channels=384,
                              in_index=0,
                              num_layers=2,
                              num_heads=6,
                              mlp_ratio=4,
                              dropout_ratio=0.0,
                              num_classes=2,
                              align_corners=False,
                              loss_decode=dict(type='CrossEntropyLoss',
                                               use_sigmoid=True,
                                               loss_weight=1.0)),
             train_cfg=dict(),
             test_cfg=dict(mode='whole'))
