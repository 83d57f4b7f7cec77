# BEiT/MAE fine-tuning schedule: AdamW with layer-wise learning-rate decay
# (upstream mmseg `LearningRateDecayOptimizerConstructor` recipe — lr decays
# geometrically from the head toward the patch embedding; embeddings, biases
# and other 1-D params take no weight decay).
seed = 123
deterministic = True

epochs = 40

train_batch_size = 8
val_batch_size = 8

num_workers = 4

optimizer = dict(type='AdamW',
                 lr=3e-5,
                 betas=(0.9, 0.999),
                 weight_decay=0.05,
                 paramwise_cfg=dict(
                     num_layers=12,          # BEiT-B / MAE-B depth
                     layer_decay_rate=0.9,
                     custom_keys={
                         'decode_head': dict(lr_mult=10.0),
                     }))

# learning policy: short linear warmup, then poly decay to 0
lr_config = dict(type='WarmScheduler',
                 warmup_epochs=2,
                 mode='linear',
                 warmup_ratio=1e-3,
                 after=dict(type='PolynomialLR',
                            total_iters=38,
                            power=1.0))

amp = True
