seed = 0
deterministic = True
epochs = 2
train_batch_size = 8
val_batch_size = 8
num_workers = 2
optimizer = dict(type='SGD', lr=0.05, momentum=0.9, weight_decay=0.0005)
lr_config = dict(type='StepLR', step_size=1, gamma=0.5)
amp = False
