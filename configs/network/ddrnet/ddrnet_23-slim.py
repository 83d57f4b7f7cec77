# DDRNet-23-slim (Hong et al., 2021): dual-resolution realtime backbone
# with DAPPM context pooling and the official segmenthead pair (DDRHead):
# context decode on the merged 1/8 features + the 0.4x spatial-tap loss,
# both OHEM-mined (upstream mmseg recipe).  Beyond-reference family,
# Kvasir binary convention.
norm_cfg = dict(type='SyncBatchNorm', requires_grad=True)
model = dict(type='EncoderDecoder',
             backbone=dict(type='DDRNet', channels=32, ppm_channels=128,
                           norm_cfg=norm_cfg, align_corners=False),
             decode_head=dict(type='DDRHead', in_channels=128,
                              channels=64, dropout_ratio=0.0, num_classes=2,
                              norm_cfg=norm_cfg, align_corners=False,
                              loss_decode=[
                                  dict(type='OhemCrossEntropy', thres=0.9,
                                       min_kept=26214, loss_weight=1.0),
                                  dict(type='OhemCrossEntropy', thres=0.9,
                                       min_kept=26214, loss_weight=0.4)]),
             train_cfg=dict(), test_cfg=dict(mode='whole'))
