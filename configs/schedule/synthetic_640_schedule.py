seed = 0
deterministic = True
epochs = 1
train_batch_size = 16
val_batch_size = 8
num_workers = 4
optimizer = dict(type='SGD', lr=0.01, momentum=0.9, weight_decay=0.0005)
lr_config = dict(type='StepLR', step_size=10, gamma=0.1)
amp = True
