# UPerNet with MAE-base fine-tuning (He et al., CVPR 2022): BEiT-style
# blocks (rel-pos bias, q/v bias, layer scale init 1.0) PLUS a learned
# absolute position embedding and depth-rescaled init (fix_init_weight);
# Feature2Pyramid rescales the four stride-16 taps to a 4/8/16/32
# pyramid, UPerHead decode + FCN aux.  Beyond-reference family, Kvasir
# binary convention.
norm_cfg = dict(type='SyncBatchNorm', requires_grad=True)
model = dict(
    type='EncoderDecoder',
    backbone=dict(type='MAE', arch='base', patch_size=16,
                  pretrain_img_size=224, out_indices=(3, 5, 7, 11),
                  qv_bias=True, layer_scale_init_value=1.0,
                  drop_path_rate=0.1),
    neck=dict(type='Feature2Pyramid', embed_dim=768,
              rescales=[4, 2, 1, 0.5], norm_cfg=norm_cfg),
    decode_head=dict(type='UPerHead',
                     in_channels=[768, 768, 768, 768],
                     in_index=(0, 1, 2, 3),
                     input_transform='multiple_select',
                     pool_scales=(1, 2, 3, 6), channels=768,
                     dropout_ratio=0.1, num_classes=2,
                     norm_cfg=norm_cfg, align_corners=False,
                     loss_decode=dict(type='CrossEntropyLoss',
                                      use_sigmoid=True, loss_weight=1.0)),
    auxiliary_head=dict(type='FCNHead', in_channels=768, in_index=2,
                        channels=256, num_convs=1, concat_input=False,
                        dropout_ratio=0.1, num_classes=2,
                        norm_cfg=norm_cfg, align_corners=False,
                        loss_decode=dict(type='CrossEntropyLoss',
                                         use_sigmoid=True, loss_weight=0.4)),
    train_cfg=dict(), test_cfg=dict(mode='whole'))
