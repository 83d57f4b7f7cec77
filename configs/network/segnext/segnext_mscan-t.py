# SegNeXt-T (Guo et al., NeurIPS 2022): MSCAN-T + LightHamHead.
# Beyond-reference family, Kvasir binary convention.
norm_cfg = dict(type='SyncBatchNorm', requires_grad=True)
ham_norm_cfg = dict(type='GroupNorm', num_groups=32, requires_grad=True)
model = dict(type='EncoderDecoder',
             backbone=dict(type='MSCAN', arch='tiny', drop_path_rate=0.1,
                           out_indices=(0, 1, 2, 3), norm_cfg=norm_cfg),
             decode_head=dict(type='LightHamHead',
                              in_channels=[64, 160, 256], in_index=[1, 2, 3],
                              input_transform='multiple_select',
                              channels=256, ham_channels=256,
                              ham_kwargs=dict(MD_S=1, MD_R=16,
                                              TRAIN_STEPS=6, EVAL_STEPS=7,
                                              INV_T=100, RAND_INIT=True),
                              dropout_ratio=0.1, num_classes=2,
                              norm_cfg=ham_norm_cfg, align_corners=False,
                              loss_decode=dict(type='CrossEntropyLoss',
                                               use_sigmoid=True,
                                               loss_weight=1.0)),
             train_cfg=dict(), test_cfg=dict(mode='whole'))
