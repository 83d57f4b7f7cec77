# BiSeNetV2 (Yu et al., IJCV 2021): realtime bilateral network — detail
# + semantic branches with guided aggregation, FCN decode on the fused
# 1/8 map and boosting aux heads on every semantic stage.  Beyond-
# reference family adapted to this framework's binary Kvasir convention
# (num_classes=2, sigmoid CE).
norm_cfg = dict(type='SyncBatchNorm', requires_grad=True)
num_classes = 2


def _aux(in_ch, ch):
    return dict(type='FCNHead', in_channels=in_ch, channels=ch,
                num_convs=1, concat_input=False, dropout_ratio=0.1,
                num_classes=num_classes, norm_cfg=norm_cfg,
                align_corners=False,
                loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=True,
                                 loss_weight=1.0))


model = dict(type='EncoderDecoder',
             backbone=dict(type='BiSeNetV2',
                           detail_channels=(64, 64, 128),
                           semantic_channels=(16, 32, 64, 128),
                           semantic_expansion_ratio=6,
                           bga_channels=128,
                           out_indices=(0, 1, 2, 3, 4),
                           align_corners=False,
                           norm_cfg=norm_cfg),
             decode_head=dict(type='FCNHead', in_channels=128, in_index=0,
                              channels=1024, num_convs=1, concat_input=False,
                              dropout_ratio=0.1, num_classes=num_classes,
                              norm_cfg=norm_cfg, align_corners=False,
                              loss_decode=dict(type='CrossEntropyLoss',
                                               use_sigmoid=True,
                                               loss_weight=1.0)),
             auxiliary_head=[dict(_aux(16, 16), in_index=1),
                             dict(_aux(32, 64), in_index=2),
                             dict(_aux(64, 256), in_index=3),
                             dict(_aux(128, 1024), in_index=4)],
             train_cfg=dict(), test_cfg=dict(mode='whole'))
