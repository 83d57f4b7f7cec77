# SegFormer training schedule (paper recipe adapted to the epoch-stepped
# scheduler convention of this lab): AdamW with a linear warmup chained
# into a power-1.0 polynomial decay.
seed = 123
deterministic = True

epochs = 60

train_batch_size = 16
val_batch_size = 8

num_workers = 4

# optimizer — AdamW, decoupled weight decay (paper: lr 6e-5 ... 6e-4 by
# batch; 6e-4 suits batch 16 single-chip fine-tuning)
optimizer = dict(type='AdamW',
                 lr=6e-4,
                 betas=(0.9, 0.999),
                 weight_decay=0.01)

# learning policy: warm up for 3 epochs, then poly decay to 0
lr_config = dict(type='WarmScheduler',
                 warmup_epochs=3,
                 mode='linear',
                 warmup_ratio=1e-2,
                 after=dict(type='PolynomialLR',
                            total_iters=57,
                            power=1.0))

# runtime settings: amp=True maps to the bf16 compute policy on TPU
amp = True
